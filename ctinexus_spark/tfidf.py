"""Minimal TF-IDF vectorizer for kNN demonstration retrieval.

The reference fits sklearn's TfidfVectorizer over the cleaned demo
corpus and ranks by dot product (llm_processor.py:1309-1353). sklearn
is not available here, so this implements the same default math:
token pattern ``(?u)\\b\\w\\w+\\b``, lowercase, smooth idf
``ln((1+n)/(1+df)) + 1``, l2 row normalization.

The demo corpus is tiny (148 docs), so the vectorizer is fit once on
the driver and broadcast; per-document query vectors are computed
inside a pandas UDF against the broadcast matrix — a broadcast kNN
join with no shuffle.

Note (SURVEY.md §2.3 fidelity note): the reference's shipped kNN ranks
demo #0 against the other demos — query-independent. We implement the
intended query-conditioned retrieval: the query text is cleaned with
the same token rules and ranked against all demos.
"""

from __future__ import annotations

import re

import numpy as np

from ctinexus_spark.stopwords import ENGLISH_STOPWORDS

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")
_NON_ALPHA_RE = re.compile(r"[^a-zA-Z]")


def clean_for_retrieval(text: str) -> str:
    """Reference token cleaning (llm_processor.py:1336-1342): per
    whitespace-split word, strip non-letters to spaces, lowercase,
    drop stopwords, rejoin."""
    kept = []
    for w in text.split():
        w = _NON_ALPHA_RE.sub(" ", w).lower()
        if w not in ENGLISH_STOPWORDS:
            kept.append(w)
    return " ".join(kept)


class TfidfModel:
    """Fit on a small corpus driver-side; transform queries anywhere."""

    def __init__(self, corpus: list[str]):
        tokenized = [_TOKEN_RE.findall(doc.lower()) for doc in corpus]
        vocab: dict[str, int] = {}
        df_counts: dict[str, int] = {}
        for toks in tokenized:
            for t in sorted(set(toks)):
                df_counts[t] = df_counts.get(t, 0) + 1
                if t not in vocab:
                    vocab[t] = 0
        # sklearn orders features alphabetically.
        self.vocab = {t: i for i, t in enumerate(sorted(vocab))}
        n = len(corpus)
        self.idf = np.ones(len(self.vocab))
        for t, i in self.vocab.items():
            self.idf[i] = np.log((1 + n) / (1 + df_counts[t])) + 1.0
        self.matrix = np.vstack([self._vectorize(toks) for toks in tokenized]) if corpus else np.zeros((0, 0))

    def _vectorize(self, tokens: list[str]) -> np.ndarray:
        vec = np.zeros(len(self.vocab))
        for t in tokens:
            i = self.vocab.get(t)
            if i is not None:
                vec[i] += 1.0
        vec *= self.idf
        norm = np.linalg.norm(vec)
        return vec / norm if norm > 0 else vec

    def transform(self, text: str) -> np.ndarray:
        return self._vectorize(_TOKEN_RE.findall(text.lower()))

    def top_k(self, query_text: str, k: int, permutation: str = "asc") -> list[tuple[int, float]]:
        """Ranked (demo_index, similarity) pairs; 'asc' reverses the
        ranked top-k as the reference permutation does
        (llm_processor.py:1349-1353)."""
        if self.matrix.size == 0:
            return []
        sims = self.matrix @ self.transform(query_text)
        order = np.argsort(-sims, kind="stable")[:k]
        ranked = [(int(i), float(sims[i])) for i in order]
        return ranked[::-1] if permutation == "asc" else ranked
