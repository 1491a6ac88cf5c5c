"""Per-partition metrics collection.

Replaces the reference's per-call UsageCalculator dicts
(llm_processor.py:1214-1272) with metrics *rows*: each Arrow batch /
partition appends (stage, partition_id, rows, wall_ms, tokens_in,
tokens_out, cost) records that land in a metrics table next to the
stage output. Cost model mirrors config/cost.json pricing: price per
token × token counts.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

METRICS_SCHEMA = (
    "stage string, partition_id int, rows bigint, wall_ms double, "
    "tokens_in bigint, tokens_out bigint, cost double"
)

# Example per-token prices (USD) — the reference ships a 30-model
# table in config/cost.json; the stub model is free but the plumbing
# carries real numbers for any ModelClient that reports usage.
TOKEN_PRICES = {
    "stub": (0.0, 0.0),
    "gpt-4.1": (2e-06, 8e-06),
}


def calculate_usage(model: str, response) -> dict:
    """Token/cost accounting over the three response shapes the
    reference's UsageCalculator accepts (llm_processor.py:1214-1272):
    an object with a .usage attribute, a dict with a 'usage' key, and
    anything else → zeros."""
    iprice, oprice = TOKEN_PRICES.get(model, (0.0, 0.0))

    if hasattr(response, "usage"):
        p = response.usage.prompt_tokens
        c = response.usage.completion_tokens
    elif isinstance(response, dict) and "usage" in response:
        p = response["usage"].get("prompt_tokens", 0)
        c = response["usage"].get("completion_tokens", 0)
    else:
        p = c = 0

    return {
        "model": model,
        "input": {"tokens": p, "cost": iprice * p},
        "output": {"tokens": c, "cost": oprice * c},
        "total": {"tokens": p + c, "cost": iprice * p + oprice * c},
    }


def measure_partitions(df: DataFrame, stage: str, model_name: str = "stub") -> DataFrame:
    """Map a DataFrame to per-partition metrics rows. Token counts are
    approximated as whitespace tokens over string columns (a real
    ModelClient would report exact usage per batch)."""
    iprice, oprice = TOKEN_PRICES.get(model_name, (0.0, 0.0))
    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        t0 = time.perf_counter()
        rows = 0
        tokens = 0
        for pdf in batches:
            rows += len(pdf)
            for c in str_cols:
                if c in pdf:
                    tokens += int(pdf[c].fillna("").str.count(" ").sum()) + len(pdf)
        wall = (time.perf_counter() - t0) * 1000
        yield pd.DataFrame(
            [(stage, pid, rows, wall, tokens, 0, iprice * tokens)],
            columns=["stage", "partition_id", "rows", "wall_ms", "tokens_in", "tokens_out", "cost"],
        )

    return df.mapInPandas(run, schema=METRICS_SCHEMA)
