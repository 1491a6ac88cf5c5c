"""ET stage: entity typing.

Reference behavior: ONE prompt per document carrying all of its
triples (llm_processor.py:163-213); response keys `tagged_triples` or
`triplets`; typed validation (cti_processor.py:118-144); dict-valued
class → first key; missing class → "default"
(cti_processor.py:194-198).

Spark shape: triples are re-grouped per document with
`sort_array(collect_list(struct(...)))` (map-side partial aggregation,
one shuffle on url), then a `mapInPandas` batch calls the model once
per Arrow batch of documents and explodes typed triples back out.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ctinexus_spark.jsonrepair import parse_llm_json
from ctinexus_spark.validation import valid_typed_triplet

ET_SCHEMA = (
    "url string, t_idx int, subject_text string, subject_class string, "
    "relation string, object_text string, object_class string, valid boolean"
)


def _first_key_or_default(cls) -> str:
    if isinstance(cls, dict):
        keys = list(cls.keys())
        return keys[0] if keys else "default"
    if isinstance(cls, str) and cls:
        return cls
    return "default"


def tag_triples(triples_ie: DataFrame, docs: DataFrame, model) -> DataFrame:
    """triples_ie(url, t_idx, subject, relation, object) + documents →
    typed triples (url, t_idx, subject_text, subject_class, relation,
    object_text, object_class, valid)."""
    per_doc = (
        triples_ie.groupBy("url")
        .agg(F.sort_array(F.collect_list(F.struct("t_idx", "subject", "relation", "object"))).alias("triples"))
        .join(docs.select("url", "text_norm"), "url", "left")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text_norm"].fillna("").tolist()
            triples_per_doc = [
                [
                    {"subject": t["subject"], "relation": t["relation"], "object": t["object"]}
                    for t in doc_triples
                ]
                for doc_triples in pdf["triples"]
            ]
            responses = model.tag(texts, triples_per_doc)
            rows = []
            for url, resp in zip(pdf["url"], responses):
                try:
                    payload = parse_llm_json(resp)
                except ValueError:
                    payload = {}
                if not isinstance(payload, dict):
                    payload = {}
                tagged = payload.get("tagged_triples")
                if tagged is None:
                    tagged = payload.get("triplets", [])
                if not isinstance(tagged, list):
                    tagged = []
                for i, t in enumerate(tagged):
                    ok = valid_typed_triplet(t)
                    subj = t.get("subject") if isinstance(t, dict) else {}
                    obj = t.get("object") if isinstance(t, dict) else {}
                    subj = subj if isinstance(subj, dict) else {}
                    obj = obj if isinstance(obj, dict) else {}
                    rows.append(
                        (
                            url,
                            i,
                            subj.get("text"),
                            _first_key_or_default(subj.get("class")),
                            t.get("relation") if isinstance(t, dict) else None,
                            obj.get("text"),
                            _first_key_or_default(obj.get("class")),
                            ok,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "t_idx", "subject_text", "subject_class",
                    "relation", "object_text", "object_class", "valid",
                ],
            )

    return per_doc.mapInPandas(run, schema=ET_SCHEMA)
