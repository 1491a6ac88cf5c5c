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

# Per-token prices (USD) as (input, output) — the reference's full
# cost table (config/cost.json, 46 models incl. the zero-cost local
# ollama/embedding entries); "stub" added for the free test model.
TOKEN_PRICES = {
    "stub": (0.0, 0.0),
    "gpt-4.1": (2e-06, 8e-06),
    "gpt-4o": (2.5e-06, 1e-05),
    "gpt-4": (3e-05, 6e-05),
    "gpt-4-turbo": (1e-05, 3e-05),
    "gpt-3.5-turbo": (5e-07, 1.5e-06),
    "gpt-4.1-mini": (4e-07, 1.6e-06),
    "gpt-4o-mini": (1.5e-07, 6e-07),
    "gpt-4.1-nano": (1e-07, 4e-07),
    "o3": (2e-06, 8e-06),
    "o3-pro": (2e-05, 8e-05),
    "o3-mini": (1.1e-06, 4.4e-06),
    "o4-mini": (1.1e-06, 4.4e-06),
    "anthropic.claude-3-7-sonnet": (3e-06, 1.5e-05),
    "anthropic.claude-3-5-sonnet": (3e-06, 1.5e-05),
    "anthropic.claude-3-5-haiku": (8e-07, 4e-06),
    "anthropic.claude-3-haiku": (2.5e-07, 1.25e-06),
    "amazon.nova-micro-v1:0": (3.5e-08, 1.4e-07),
    "amazon.nova-lite-v1:0": (6e-08, 2.4e-07),
    "amazon.nova-pro-v1:0": (4.5e-07, 1.8e-06),
    "deepseek.r1-v1:0": (1.4e-07, 7e-07),
    "mistral.pixtral-large-2502-v1:0": (1e-06, 3e-06),
    "meta.llama3-1-8b-instruct-v1:0": (1.5e-07, 6e-07),
    "meta.llama3-1-70b-instruct-v1:0": (7.5e-07, 3e-06),
    "meta.llama3-2-11b-instruct-v1:0": (2e-07, 8e-07),
    "text-embedding-3-small": (2e-08, 0.0),
    "text-embedding-3-large": (1.3e-07, 0.0),
    "text-embedding-ada-002": (1e-07, 0.0),
    "amazon.titan-embed-text-v2:0": (1.2e-07, 0.0),
    "gemini-2.5-flash-lite": (1e-07, 4e-07),
    "gemini-2.0-flash": (1e-07, 4e-07),
    "gemini-2.0-flash-lite": (7.5e-08, 3e-07),
    "gemini-embedding-001": (1.5e-07, 0.0),
    # local (ollama) models and embedders run at zero marginal cost
    "llama3.1:8b": (0.0, 0.0),
    "llama3.1:70b": (0.0, 0.0),
    "llama3:8b": (0.0, 0.0),
    "mistral:7b": (0.0, 0.0),
    "mixtral:8x7b": (0.0, 0.0),
    "qwen2.5:7b": (0.0, 0.0),
    "qwen2.5:14b": (0.0, 0.0),
    "phi3:14b": (0.0, 0.0),
    "gemma2:9b": (0.0, 0.0),
    "gemma2:27b": (0.0, 0.0),
    "nomic-embed-text": (0.0, 0.0),
    "mxbai-embed-large": (0.0, 0.0),
    "all-minilm": (0.0, 0.0),
    "snowflake-arctic-embed": (0.0, 0.0),
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
