"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship KG-materialization query at sf0.001.
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL twin (see
ctinexus_spark/entry_queries.py for the pairing rationale).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ctinexus_spark import dataset_queries, entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG pipeline (IE→ET→EA→LP→materialize) over
    sf0.001 documents; driver checks rows>0 and stable schema."""
    return entry_queries.q_kg_fused(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**entry_queries.QUERIES, **dataset_queries.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**entry_queries.ORACLES, **dataset_queries.ORACLES}
