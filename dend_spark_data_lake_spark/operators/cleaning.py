"""Row-cleaning operators (reference F1/F2/P4, SURVEY.md §2.1).

All are thin, declarative compositions — Catalyst folds them into the scan's
pushed filters, so they cost nothing extra at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_null_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Drop rows with NULL in *any* of ``subset``.

    Reference F1: ``df.dropna(how="any", subset=[...])``
    (``/root/reference/etl_pipeline.py:198-214``).
    """
    return df.dropna(how="any", subset=list(subset))


def drop_empty_string_rows(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Drop rows where *any* of ``subset`` equals the empty string.

    Implements the reference's documented *intent* ("Filter rows with nulls
    and empty strings", ``etl_pipeline.py:193-196``): AND of non-empty.
    The reference as written ORs the conditions (defect D2,
    ``etl_pipeline.py:216-225``) making the filter a near-no-op.
    """
    cond: Column = reduce(lambda a, c: a & (F.col(c) != F.lit("")), subset, F.lit(True))
    return df.filter(cond)


def sentinel_to_null(df: DataFrame, column: str, sentinel) -> DataFrame:
    """Normalize a sentinel value to NULL.

    Reference P4: ``when(df["year"] == 0, lit(None)).otherwise(df["year"])``
    (``etl_pipeline.py:50-52``). Equivalent to SQL ``NULLIF``.
    """
    return df.withColumn(
        column, F.when(F.col(column) == F.lit(sentinel), F.lit(None)).otherwise(F.col(column))
    )
