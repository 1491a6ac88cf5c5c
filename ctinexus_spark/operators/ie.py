"""IE stage: kNN demonstration retrieval + batched triple extraction.

Reference behavior: per document, retrieve top-k TF-IDF-similar demos
(llm_processor.py:1309-1353), build a prompt, one LLM call, tolerant
JSON parse, validation filter (llm_processor.py:1185-1211, 81-137).

Spark shape:
- the demo corpus (~148 docs) is fit into a TF-IDF model once on the
  driver and captured by closure → broadcast to executors; retrieval
  is a *broadcast kNN join* inside a pandas UDF — zero shuffle.
- extraction runs in `mapInPandas`: one ModelClient batch call per
  Arrow batch (strictly better batching than the reference's
  one-call-per-doc), JSON repair + validation per response.
- invalid triplets land in a `valid=false` side-output instead of a
  log line.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.jsonrepair import parse_llm_json
from ctinexus_spark.tfidf import TfidfModel, clean_for_retrieval
from ctinexus_spark.validation import valid_ie_triplet

IE_SCHEMA = (
    "url string, t_idx int, subject string, relation string, object string, valid boolean"
)


def attach_demos(
    docs: DataFrame,
    demo_texts: list[str],
    demo_ids: list[str],
    config: PipelineConfig | None = None,
) -> DataFrame:
    """Add `demo_ids: array<string>` — the top-k in-context examples
    per document (query-conditioned, see SURVEY.md §2.3 fidelity note)."""
    cfg = config or PipelineConfig()
    model = TfidfModel([clean_for_retrieval(t) for t in demo_texts])
    ids = list(demo_ids)
    shot, perm = cfg.shot, cfg.demo_permutation

    @pandas_udf("array<string>")
    def _topk(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            ranked = model.top_k(clean_for_retrieval(t or ""), shot, perm)
            out.append([ids[i] for i, _ in ranked])
        return pd.Series(out)

    return docs.withColumn("demo_ids", _topk(F.col("text_norm")))


def attach_random_demos(
    docs: DataFrame,
    demo_ids: list[str],
    config: PipelineConfig | None = None,
) -> DataFrame:
    """Random demonstration retriever (reference
    llm_processor.py:1283-1307 — a latent dead path there; here a
    seeded shuffle): every document gets the same k random demos,
    deterministic under config.random_seed."""
    import random

    cfg = config or PipelineConfig()
    rng = random.Random(cfg.random_seed)
    picked = list(demo_ids)
    rng.shuffle(picked)
    picked = picked[: cfg.shot]
    return docs.withColumn("demo_ids", F.array(*[F.lit(d) for d in picked]))


def extract_triples(docs: DataFrame, model, text_col: str = "text_norm") -> DataFrame:
    """documents → (url, t_idx, subject, relation, object, valid).

    `model` is a ModelClient; its `.extract(texts)` gets one call per
    Arrow batch. Responses ride through the JSON-repair cascade, then
    the IE validation filter; rejects keep valid=false.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            responses = model.extract(texts)
            rows = []
            for url, resp in zip(pdf["url"], responses):
                try:
                    payload = parse_llm_json(resp)
                except ValueError:
                    payload = {"triplets": []}
                triplets = payload.get("triplets", [])
                if not isinstance(triplets, list):
                    triplets = []
                for i, t in enumerate(triplets):
                    ok = valid_ie_triplet(t)
                    subj = t.get("subject") if isinstance(t, dict) else None
                    obj = t.get("object") if isinstance(t, dict) else None
                    if isinstance(subj, dict):
                        subj = subj.get("text") or subj.get("mention_text")
                    if isinstance(obj, dict):
                        obj = obj.get("text") or obj.get("mention_text")
                    rows.append(
                        (
                            url,
                            i,
                            subj if isinstance(subj, str) else None,
                            t.get("relation") if isinstance(t, dict) else None,
                            obj if isinstance(obj, str) else None,
                            ok,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "t_idx", "subject", "relation", "object", "valid"]
            )

    cols = ["url", text_col]
    return docs.select(*cols).mapInPandas(run, schema=IE_SCHEMA)
