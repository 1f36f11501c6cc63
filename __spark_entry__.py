"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``dend_spark_data_lake_spark.queries`` (one entry per implemented operator
from SURVEY.md §2, each oracle-checked against DuckDB where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dend_spark_data_lake_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The songplays-analog star join (SURVEY.md §2.2 #5): fact⋈fact equi-join
    + broadcast dimension joins + projection with calendar derivation.
    """
    return Q.ref_star_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
