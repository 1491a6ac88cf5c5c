"""Cross-document (global) entity resolution.

The reference's EA merges mentions INSIDE one document
(graph_constructor.py:246-441 operates per report); its graphs never
merge entities across reports. At web scale the corpus-level merge is
the step that turns per-document graphs into one knowledge graph, so
this rebuild adds it as a first-class operator built from the already-
verified scale pieces — every step a bucketed equi-join or a
label-propagation round, no all-pairs anywhere:

    distinct entity texts
      → Arrow-batched embeddings            (operators/ea.embed_mentions)
      → banded sign-LSH candidate pairs +
        exact cosine ≥ threshold re-rank    (dedup.embedding_near_dups_lsh)
      → distributed connected components    (graph/components.py)
      → global_id = min entity text reachable in the component
        (singletons keep their own text).

Scale shape: |distinct entity texts| ≪ |mentions|; the LSH band join
bounds pair generation at Σ bucket²/2 per band with the degenerate-
bucket cap, and the CC runs O(component diameter) rounds — entity-alias
components are shallow (a few name variants), so rounds stay small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ctinexus_spark.graph.components import connected_components
from ctinexus_spark.operators.dedup import embedding_near_dups_lsh
from ctinexus_spark.operators.ea import embed_mentions
from ctinexus_spark.partitioning import barrier


def global_entity_resolution(
    entities: DataFrame,
    model,
    threshold: float = 0.6,
) -> DataFrame:
    """entities(entity_text, ...) → (entity_text, global_id): one row
    per distinct entity text, global_id shared by all texts whose
    similarity components connect at ≥ threshold.

    Both `texts` and `emb` are multi-consumer branch points (texts
    feeds the embed pass AND the final join; emb feeds the LSH banding
    AND both sides of the candidate re-rank join), so both go through
    barrier() — without it every consumer recomputes the caller's
    entire upstream lineage (measured: the full modular EA pipeline ran
    3× inside one bench query, 37 s for a 28-entity corpus). Round-6
    interleaved A/B of dropping the emb barrier measured NEUTRAL at
    sf0.1 (the removal was tried and reverted) — kept for the general
    case where embed batches are not trivially cheap."""
    texts = barrier(entities.select("entity_text").distinct())
    emb = embed_mentions(texts.select(F.col("entity_text").alias("mention_text")), model)
    emb = barrier(emb.select(F.col("mention_text").alias("entity_text"), "embedding"))
    pairs = embedding_near_dups_lsh(
        emb, id_col="entity_text", vec_col="embedding", threshold=threshold,
        input_materialized=True,  # emb is checkpointed just above
    )
    comps = connected_components(pairs, "a_id", "b_id")
    return (
        texts.join(comps.withColumnRenamed("vertex", "entity_text"), "entity_text", "left")
        .select(
            "entity_text",
            F.coalesce(F.col("component"), F.col("entity_text")).alias("global_id"),
        )
    )
