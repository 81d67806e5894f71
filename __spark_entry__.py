"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcript pipeline (parse -> enrich ->
sessionize -> aggregate -> top tools) on the deterministic synthetic
fixture plus a smoke aggregation over the sf0.001 testdata. ``queries()``/
``oracle_sql()`` expose every implemented operator from SURVEY.md §2;
oracle-backed entries are verified bit-exact against DuckDB locally via
tools/verify_queries.py before shipping.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline over the deterministic transcript fixture,
    returning the top-tools report (stable schema, >0 rows)."""
    from webalizer_spark.queries import QUERIES

    return QUERIES["tr_top_tools"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from webalizer_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from webalizer_spark.queries import ORACLE

    return dict(ORACLE)
