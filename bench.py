"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "docs_per_sec": ..., "scaling": {...}?}

Set SPARK_GRAFT_SCALING=1 to also run the full pipeline at two
parallelism levels (local[8] vs local[32]) for the north_rule's
two-cluster-size scaling-efficiency evidence (recorded in
BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ctinexus_spark import entry_queries  # noqa: E402
from ctinexus_spark.session import build_session  # noqa: E402


def _headline_queries():
    """name → callable(spark, sf_dir) returning a DataFrame. Kept in
    one place so bench and the scaling run stay in sync."""
    q = {
        "kg_pipeline": entry_queries.q_kg_fused,  # fused fast path
        "kg_modular": entry_queries.q_kg_triples,
        "ie_triples": entry_queries.q_ie_triples,
        "lp_graph": entry_queries.q_lp_graph,
    }
    # optional families (land in later milestones; import-gated)
    try:
        from ctinexus_spark import dataset_queries

        q.update(dataset_queries.BENCH_QUERIES)
    except ImportError:
        pass
    return q


def _run_all(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name, fn in _headline_queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # force full execution
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.2f}s ({n} rows)", file=sys.stderr)
    return times


def _doc_count(spark, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = build_session(app_name="ctinexus-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    n_docs = _doc_count(spark, sf_dir)

    t0 = time.perf_counter()
    times = _run_all(spark, sf_dir)
    total = round(time.perf_counter() - t0, 3)

    # pipeline throughput: full-KG query wall time over the doc count
    pipe_sec = times.get("kg_pipeline", total)
    docs_per_sec = round(n_docs / pipe_sec, 2) if pipe_sec else None

    # steady-state: second run with warm Python workers/caches — the
    # number a production-length job converges to
    spark.catalog.clearCache()
    t = time.perf_counter()
    _headline_queries()["kg_pipeline"](spark, sf_dir).count()
    warm_sec = round(time.perf_counter() - t, 3)
    docs_per_sec_warm = round(n_docs / warm_sec, 2) if warm_sec else None

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "kg_warm_sec": warm_sec,
        "docs_per_sec_warm": docs_per_sec_warm,
        "cpus": cpus,
    }
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        scaling = {}
        for c in (8, 32):
            s = build_session(app_name=f"ctinexus-scale-{c}", master=f"local[{c}]",
                              shuffle_partitions=max(c, 8))
            s.sparkContext.setLogLevel("ERROR")
            t = time.perf_counter()
            entry_queries.q_kg_triples(s, sf_dir).count()
            wall = time.perf_counter() - t
            scaling[f"local[{c}]"] = {
                "sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 2),
            }
            s.stop()
        t8 = scaling["local[8]"]["sec"]
        t32 = scaling["local[32]"]["sec"]
        # efficiency of 4x cores: (T_N / T_4N) / 4
        out["scaling"] = {**scaling, "efficiency_8_to_32": round((t8 / t32) / 4, 3)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
