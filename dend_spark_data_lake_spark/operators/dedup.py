"""Deduplication operators.

The reference's signature operator (SURVEY.md §2.1 DD1/DD2): a
``row_number()`` window + ``filter(rn = 1)`` + ``drop`` composite used three
times (``/root/reference/etl_pipeline.py:54-65,88-99,143-154``), plus plain
``dropDuplicates()`` for the time table (``etl_pipeline.py:190``).

The window form is deliberate: ``dropDuplicates(keys)`` keeps an *arbitrary*
row per key, while the reference's semantics require an explicit tie-break
(keep-first by sort key; keep-latest by timestamp). At scale both forms are a
single hash-shuffle on the key; the window adds only an in-partition sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def _keyed_dedup(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Keep the first row per key, ordered ascending by ``order_by``.

    Reference: songs dedup (partition ``song_id`` order ``artist_id,song_id``,
    ``etl_pipeline.py:55-63``) and artists dedup (``:89-97``).
    """
    return _keyed_dedup(df, keys, [F.col(c).asc() for c in order_by])


def dedup_keep_latest(df: DataFrame, keys: Sequence[str], ts_col: str,
                      tie_break: Sequence[str] = ()) -> DataFrame:
    """Keep the most-recent row per key by ``ts_col`` descending.

    Reference: users dedup — latest record per ``user_id`` wins so ``level``
    reflects the user's current plan (``etl_pipeline.py:143-154``).
    ``tie_break`` columns (descending) make the result deterministic when
    timestamps collide — required for oracle-checked output.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tie_break]
    return _keyed_dedup(df, keys, order)


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Distinct rows (reference DD2, ``etl_pipeline.py:190``)."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()
