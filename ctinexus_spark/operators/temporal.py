"""Temporal joins over event tables.

The as-of join — "for each left row, the most recent right row at or
before its timestamp, per key" — is the trade/quote, price/event,
config/rollout primitive. Naively it is a range join (every left row
against every earlier right row), which Spark plans as a quadratic
nested loop per key. The scalable formulation is window-over-union:
tag both sides, union them, shuffle ONCE on the key, sort within
partitions by (ts, side) with right rows first at tie, and carry the
right payload forward with last(ignore_nulls) over a running row
frame. One shuffle + one sort, linear state, no range join — at any
key cardinality or history depth.

Reference scope: the reference engine (peng-gao-lab/ctinexus) has no
temporal layer; this extends the training-data-pipeline families the
rebuild adds on top of SURVEY.md §2. The DuckDB twin uses the
engine's NATIVE ASOF JOIN — an independently implemented operator —
so the correctness gate compares two unrelated as-of algorithms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Left as-of join: every left row, plus `payload` columns from
    the latest right row with right.ts <= left.ts on the same key
    (null payload when no such row exists).

    Determinism contract: right must be unique per (key, ts) — dedupe
    upstream (struct-max winner, the line_dedup pattern) — because the
    running carry takes "the" right row at each timestamp. Left rows
    tie-break freely: they hold null payload, so their mutual order
    cannot change any last(ignore_nulls) result; right rows sort
    before left rows at an equal timestamp (side 0 < 1), which
    implements the <= (inclusive) match.

    Scale shape: one union (no shuffle), one exchange on `key`, one
    within-partition sort, one window pass. Payload values are carried
    verbatim (no arithmetic), so float columns are trivially bit-exact
    cross-engine.
    """
    left_cols = left.columns
    clash = set(left_cols) & set(payload)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")
    r_sel = [F.col(key), F.col(ts), F.lit(0).alias("_side")]
    r_sel += [F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left_cols if c not in (key, ts)]
    r_sel += [F.col(c) for c in payload]
    l_sel = [F.col(key), F.col(ts), F.lit(1).alias("_side")]
    l_sel += [F.col(c) for c in left_cols if c not in (key, ts)]
    l_sel += [F.lit(None).cast(right.schema[c].dataType).alias(c)
              for c in payload]
    u = right.select(*r_sel).unionByName(left.select(*l_sel))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_c_{c}").alias(c) for c in payload],
    )
