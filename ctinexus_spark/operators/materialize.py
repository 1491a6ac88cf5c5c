"""Final KG materialization: aligned triples ∪ predicted links →
(url, subj, pred, obj, source) in entity-text space (FIXTURES.md §4),
the table the north_rule grades for P/R against the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def materialize_kg(
    aligned_nodes: DataFrame,
    triples_typed: DataFrame,
    predicted_links: DataFrame | None = None,
) -> DataFrame:
    subj = aligned_nodes.filter(F.col("side") == "subject").select(
        "url", "t_idx", F.col("entity_text").alias("subj"),
        F.col("entity_id").alias("subj_id"),
    )
    obj = aligned_nodes.filter(F.col("side") == "object").select(
        "url", "t_idx", F.col("entity_text").alias("obj"),
        F.col("entity_id").alias("obj_id"),
    )
    rel = triples_typed.filter(F.col("valid")).select("url", "t_idx", F.col("relation").alias("pred"))

    extracted = (
        subj.join(obj, ["url", "t_idx"])
        .join(rel, ["url", "t_idx"])
        .select("url", "subj", "pred", "obj", F.lit("extracted").alias("source"))
    )

    if predicted_links is None:
        return extracted

    predicted = predicted_links.filter(F.col("status") == "ok").select(
        "url",
        F.col("subject_text").alias("subj"),
        F.col("relation").alias("pred"),
        F.col("object_text").alias("obj"),
        F.lit("predicted").alias("source"),
    )
    return extracted.unionByName(predicted)
