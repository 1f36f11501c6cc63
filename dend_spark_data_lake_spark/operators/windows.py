"""Window-function helpers (reference W1/W2/F4 generalized, SURVEY.md §2.1)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_top_k(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per key group — the reference's W1+F4 idiom generalized.

    One shuffle on ``keys``; the in-partition sort is bounded by group size.
    For global top-k use ``orderBy(...).limit(k)`` (Spark's TakeOrdered
    avoids a full sort).
    """
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
