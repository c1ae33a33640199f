"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine package; see
cspirit_ontology_information_extraction_opus4plan_spark/api.py (Spark
implementations) and oracle_sqls.py (DuckDB equivalents).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cspirit_ontology_information_extraction_opus4plan_spark import api
from cspirit_ontology_information_extraction_opus4plan_spark import oracle_sqls


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return api.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return api.queries()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls.oracle_sql()
