"""Datetime operators (reference T1/T2/T3, SURVEY.md §2.1).

Replaces the reference's Python-UDF timestamp path
(``/root/reference/etl_pipeline.py:170-178``: ``datetime.fromtimestamp`` UDF
+ format + cast) with the single builtin ``timestamp_millis`` — no
JVM<->Python hop, no executor-timezone dependence, no Catalyst optimization
barrier (SURVEY.md §2.4-D3, §4.2).

Weekday convention: the reference used format pattern ``"u"`` (Spark 2.4,
ISO 1=Mon..7=Sun; rejected by Spark 3+). We standardize on ISO
(``weekday()+1`` → 1=Monday..7=Sunday), which equals DuckDB's ``isodow``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_millis_to_timestamp(col: str | Column) -> Column:
    """T1: epoch milliseconds → timestamp, deterministically (UTC session)."""
    return F.timestamp_millis(F.col(col).cast("long") if isinstance(col, str) else col.cast("long"))


def iso_weekday(col: str | Column) -> Column:
    """ISO day-of-week, 1=Monday .. 7=Sunday (reference T3 intent)."""
    return F.weekday(col) + F.lit(1)


def calendar_parts(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    """T2: attach hour/day/week/month/year/weekday columns.

    Mirrors the reference time-table derivation (``etl_pipeline.py:180-188``).
    """
    c = F.col(ts_col)
    return (
        df.withColumn(prefix + "hour", F.hour(c))
        .withColumn(prefix + "day", F.dayofmonth(c))
        .withColumn(prefix + "week", F.weekofyear(c))
        .withColumn(prefix + "month", F.month(c))
        .withColumn(prefix + "year", F.year(c))
        .withColumn(prefix + "weekday", iso_weekday(c))
    )
