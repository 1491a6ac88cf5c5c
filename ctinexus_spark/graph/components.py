"""Distributed connected components (GraphFrames-free).

The per-document graphs of the KG pipeline are tiny and handled
in-batch (operators/lp.py, operators/fused.py). This operator covers
the *cross-document* graph cases the north_star's GraphFrames
connectedComponents would serve — e.g. global entity resolution over
similarity edges spanning the whole corpus — without the GraphFrames
dependency (not installable here).

Algorithm: iterative minimum-label propagation ("hash-to-min"):
  label(v) ← min(label(v), min over neighbors(label(n)))
repeated until no label changes. Each round is one join + one
aggregation; convergence needs O(diameter) rounds (large-diameter
graphs: switch to doubling variants). localCheckpoint() every
CHECKPOINT_EVERY rounds truncates the lineage — without it the plan
doubles per iteration and the job dies long before the data does
(SURVEY.md §7 hard-parts note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ctinexus_spark.partitioning import barrier

CHECKPOINT_EVERY = 3


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """edges(src, dst) → (vertex, component) where component is the
    minimum vertex id reachable. Vertex ids must be orderable
    (numeric or string).

    Raises RuntimeError if the fixpoint is not reached within
    max_iterations — silently returning unconverged labels would hand
    large-diameter graphs wrong components with no signal.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .persist()
    )
    labels.count()

    converged = False
    for it in range(max_iterations):
        # candidate labels: own label ∪ neighbors' labels
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("vertex", "b"), "b")
            .select(F.col("a").alias("vertex"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            new_labels = barrier(new_labels)
        else:
            new_labels = new_labels.persist()

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break

    sym.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — graph diameter exceeds the round budget; raise "
            "max_iterations or switch to a doubling variant"
        )
    # materialize + localCheckpoint so the persisted iteration state can
    # be released now (a returned lazy persist would leak in the cache
    # manager until an unpersist the caller never knows to issue)
    result = barrier(labels.select("vertex", "component"))
    labels.unpersist()
    return result
