"""Optimization-round instrumentation (guide §1): per-stage noop-sink
timings and .explain("formatted") captures for the expensive bench
queries. NOT part of the driver contract — bench.py stays frozen.

Usage:
  python3 bench_extra.py stages          # per-stage timings, kg chain
  python3 bench_extra.py q <name> [...]  # noop-time named bench queries
  python3 bench_extra.py plans <name>..  # dump plans to plans/r06/
  python3 bench_extra.py ab <nameA> <nameB> [reps]  # interleaved A/B

All timings use the noop sink (full materialization of every column,
no count() column pruning) and clearCache + checkpoint-block release
between measurements, mirroring bench.py's independence protocol.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ctinexus_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    s = build_session(app_name="ctinexus-bench-extra", master=f"local[{CPUS}]")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _reset(spark):
    import gc

    from ctinexus_spark.partitioning import release_checkpoint_blocks

    spark.catalog.clearCache()
    gc.collect()
    release_checkpoint_blocks(spark)


def _noop_time(spark, label, df_fn, reps=3):
    times = []
    for _ in range(reps):
        _reset(spark)
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    print(f"{label:40s} med {med:7.2f}s  {[round(t, 2) for t in times]}", flush=True)
    return med


def _bench_queries():
    from ctinexus_spark import dataset_queries, entry_queries

    q = {
        "kg_pipeline": entry_queries.q_kg_fused,
        "kg_modular": entry_queries.q_kg_triples,
        "ie_triples": entry_queries.q_ie_triples,
        "lp_graph": entry_queries.q_lp_graph,
    }
    q.update(dataset_queries.BENCH_QUERIES)
    return q


def cmd_q(names, reps=3):
    spark = _spark()
    qs = _bench_queries()
    for n in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{n}")
        _noop_time(spark, n, lambda n=n: qs[n](spark, SF_DIR), reps=reps)
    spark.stop()


def cmd_stages():
    """Per-stage isolation of the modular KG chain (guide §1.4)."""
    from ctinexus_spark import entry_queries as E
    from ctinexus_spark.model import StubModel
    from ctinexus_spark.operators.ea import align_entities, embed_mentions, mint_mentions
    from ctinexus_spark.operators.et import tag_triples
    from ctinexus_spark.operators.ie import extract_triples
    from ctinexus_spark.operators.lp import analyze_graph

    spark = _spark()
    sd = SF_DIR

    _noop_time(spark, "docs_norm", lambda: E._docs_norm(spark, sd))
    _noop_time(spark, "ie (docs→triples)", lambda: E._ie(spark, sd))

    def typed():
        return E._typed(spark, sd)

    _noop_time(spark, "typed (ie+tag)", typed)

    def nodes():
        docs = E._docs_norm(spark, sd).persist()
        ie = extract_triples(docs, StubModel(E.CONFIG)).filter("valid")
        t = tag_triples(ie, docs, StubModel(E.CONFIG))
        return mint_mentions(t)

    _noop_time(spark, "nodes (typed+mint)", nodes)

    def aligned():
        _t, a = E._aligned(spark, sd)
        return a

    _noop_time(spark, "aligned (nodes+embed+align)", aligned)

    def graph():
        _t, a = E._aligned(spark, sd)
        return analyze_graph(a)

    _noop_time(spark, "graph (aligned+analyze)", graph)
    _noop_time(spark, "kg_modular full", lambda: E.q_kg_triples(spark, sd))
    _noop_time(spark, "lp_graph full", lambda: E.q_lp_graph(spark, sd))
    _noop_time(spark, "kg_global full", lambda: E.q_kg_global_entities(spark, sd))
    spark.stop()


def cmd_plans(names):
    os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)
    spark = _spark()
    qs = _bench_queries()
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    for n in names:
        df = qs[n](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(_REPO, "plans", "r06", f"{n}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{n}: {n_ex} Exchange nodes -> {path}", flush=True)
    spark.stop()


def cmd_ab(a, b, reps=4):
    """Interleaved A/B (CLAUDE.md drift protocol): alternate the two
    queries rep times, report medians + ratio."""
    spark = _spark()
    qs = _bench_queries()
    times = {a: [], b: []}
    for rep in range(1 + reps):  # rep 0 = warm-up, discarded
        for n in (a, b):
            _reset(spark)
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rep:
                times[n].append(dt)
    ma, mb = statistics.median(times[a]), statistics.median(times[b])
    print(f"{a}: {ma:.2f}s {[round(t,2) for t in times[a]]}")
    print(f"{b}: {mb:.2f}s {[round(t,2) for t in times[b]]}")
    print(f"ratio {a}/{b} = {ma / mb:.3f}")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "stages"
    if cmd == "stages":
        cmd_stages()
    elif cmd == "q":
        cmd_q(sys.argv[2:])
    elif cmd == "plans":
        cmd_plans(sys.argv[2:])
    elif cmd == "ab":
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        cmd_ab(sys.argv[2], sys.argv[3], reps)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
