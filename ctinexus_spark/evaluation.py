"""Parity evaluation against the reference's annotated eval corpus.

BASELINE.json metric: triple extraction P/R ≥ 0.95 vs the CTINexus
annotated CTI-report eval set (subject/object EM + relation accuracy),
with byte-identical extracted text per url.

The corpus (149 JSON files, schema FIXTURES.md §3) ships with the
reference at /root/reference/ctinexus/data/annotation — loaded
read-only as EVAL DATA. Per BASELINE.md the model config is
"deterministic stub-replay": the ReplayModel answers with the
annotation's own triples exactly as the reference's mocked-litellm
tests do (reference tests/integration/test_pipeline.py:16-52), so the
measurement isolates OUR dataflow: normalize → IE parse/validate → ET
→ EA minting/merge → materialize must carry every triple through
unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.model import ReplayModel
from ctinexus_spark.pipeline import run_pipeline
from ctinexus_spark.text.normalize import normalize_text

ANNOTATION_DIR = "/root/reference/ctinexus/data/annotation"


def load_annotations(path: str = ANNOTATION_DIR, limit: int | None = None) -> dict[str, dict]:
    """url (file stem) → annotation dict.

    The corpus has one text-duplicated pair with *different* gold
    triples (pensive-ursa-uses-upgraded-kazuar-backdoor[_1]) — the
    reference, given identical input, can only produce one answer, so
    text-duplicate docs are deduped keeping the first (also mirrors
    the one demo/test split overlap noted in SURVEY.md §5)."""
    out: dict[str, dict] = {}
    seen_texts: set[str] = set()
    for name in sorted(os.listdir(path)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(path, name), encoding="utf-8") as f:
            ann = json.load(f)
        key = normalize_text(ann["text"])
        if key in seen_texts:
            continue
        seen_texts.add(key)
        out[name[: -len(".json")]] = ann
        if limit and len(out) >= limit:
            break
    return out


def build_replay_model(annotations: dict[str, dict], config: PipelineConfig) -> ReplayModel:
    extract_by_text: dict[str, list[dict]] = {}
    types_by_text: dict[str, dict[str, str]] = {}
    for ann in annotations.values():
        key = normalize_text(ann["text"])
        extract_by_text[key] = [
            {"subject": t["subject"], "relation": t["relation"], "object": t["object"]}
            for t in ann.get("explicit_triplets", [])
        ]
        tmap: dict[str, str] = {}
        for ent in ann.get("entities", []):
            tmap[ent["entity_name"]] = ent["entity_type"]
            for m in ent.get("mentions", []):
                tmap[m] = ent["entity_type"]
        types_by_text[key] = tmap
    return ReplayModel(config, extract_by_text=extract_by_text, types_by_text=types_by_text)


def annotation_documents(spark: SparkSession, annotations: dict[str, dict]):
    rows = [(url, ann["text"], "en") for url, ann in annotations.items()]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@dataclass
class ParityReport:
    n_docs: int
    n_gold: int
    n_pred: int
    n_match: int
    precision: float
    recall: float
    text_identical_docs: int
    ea_pair_precision: float = 1.0
    ea_pair_recall: float = 1.0

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def build_alias_map(annotations: dict[str, dict]) -> dict[str, str]:
    """alias mention → canonical entity_name from the annotation
    `entities` ground truth — drives the stub embedding so EA's
    cosine merge reproduces the gold clusters (the reference gets the
    same signal from real embeddings)."""
    amap: dict[str, str] = {}
    for ann in annotations.values():
        for ent in ann.get("entities", []):
            for m in ent.get("mentions", []):
                if m != ent["entity_name"]:
                    amap.setdefault(m, ent["entity_name"])
    return amap


def _ea_pair_metrics(annotations: dict[str, dict], aligned_rows) -> tuple[float, float]:
    """Pairwise same-entity link P/R over mentions that actually occur
    in each document's typed triples (EA can only merge what IE/ET
    surfaced). Pairs are unordered (m1, m2) with m1 < m2, per doc."""
    # predicted: mention_text pairs sharing entity_id per url
    by_doc_pred: dict[str, dict[int, set[str]]] = {}
    seen_mentions: dict[str, set[str]] = {}
    for r in aligned_rows:
        by_doc_pred.setdefault(r.url, {}).setdefault(r.entity_id, set()).add(r.mention_text)
        seen_mentions.setdefault(r.url, set()).add(r.mention_text)

    def pairs(groups) -> set[tuple[str, str]]:
        out = set()
        for g in groups:
            g = sorted(g)
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    out.add((g[i], g[j]))
        return out

    n_pred = n_gold = n_hit = 0
    for url, ann in annotations.items():
        present = seen_mentions.get(url, set())
        gold_groups = []
        for ent in ann.get("entities", []):
            members = {m for m in [ent["entity_name"], *ent.get("mentions", [])] if m in present}
            if len(members) > 1:
                gold_groups.append(members)
        pred_groups = [g for g in by_doc_pred.get(url, {}).values() if len(g) > 1]
        gp, pp = pairs(gold_groups), pairs(pred_groups)
        n_gold += len(gp)
        n_pred += len(pp)
        n_hit += len(gp & pp)

    return (
        n_hit / n_pred if n_pred else 1.0,
        n_hit / n_gold if n_gold else 1.0,
    )


def evaluate_parity(spark: SparkSession, limit: int | None = None) -> ParityReport:
    cfg = PipelineConfig()
    annotations = load_annotations(limit=limit)
    docs = annotation_documents(spark, annotations)
    model = build_replay_model(annotations, cfg)
    model.alias_map = build_alias_map(annotations)
    result = run_pipeline(docs, model, cfg)

    # --- triple P/R: subject/object EM + relation EM, per document ---
    pred_rows = (
        result.triples_ie.select("url", "subject", "relation", "object").collect()
    )
    pred: dict[str, set] = {}
    for r in pred_rows:
        pred.setdefault(r.url, set()).add((r.subject, r.relation, r.object))

    n_gold = n_pred = n_match = 0
    for url, ann in annotations.items():
        gold = {
            (t["subject"], t["relation"], t["object"])
            for t in ann.get("explicit_triplets", [])
        }
        got = pred.get(url, set())
        n_gold += len(gold)
        n_pred += len(got)
        n_match += len(gold & got)

    # --- EA alignment: pairwise same-entity links vs gold entities ---
    aligned_rows = result.aligned_nodes.select(
        "url", "entity_id", "mention_text"
    ).collect()
    ea_p, ea_r = _ea_pair_metrics(annotations, aligned_rows)

    # --- byte-identity: Spark text_norm == local normalize_text ---
    norm_rows = result.documents_clean.select("url", "text_norm").collect()
    identical = sum(
        1
        for r in norm_rows
        if r.text_norm == normalize_text(annotations[r.url]["text"])
    )

    return ParityReport(
        n_docs=len(annotations),
        n_gold=n_gold,
        n_pred=n_pred,
        n_match=n_match,
        precision=n_match / n_pred if n_pred else 1.0,
        recall=n_match / n_gold if n_gold else 1.0,
        text_identical_docs=identical,
        ea_pair_precision=ea_p,
        ea_pair_recall=ea_r,
    )
