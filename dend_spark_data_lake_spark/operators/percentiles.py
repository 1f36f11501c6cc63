"""Exact counting-grid percentiles — the shared machinery behind the
equidepth/weighted-median/SLO-percentile family of queries.

The technique: collapse rows to a (key, value) -> weight GRID (bounded by
the distinct-value domain, not the row count), run one cumulative window
per key over that grid, and read each percentile as the smallest value
whose integer cross-multiplied cumulative weight crosses its rank
(``den * cum_weight >= num * total``). No raw-row sort anywhere; every
float percentile definition becomes exact integer arithmetic.

Scale posture: the grid aggregate is map-side combinable; the window runs
over the per-key grid (days, token lengths, 2-decimal cents — all bounded
domains). For genuinely continuous domains the drop-in swap is
``approx_percentile`` over the raw rows; the call sites document that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grid_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    ranks: Sequence[tuple[int, int, str]],
    weight: Column | str | None = None,
    total_name: str = "total_w",
) -> DataFrame:
    """Exact per-key percentiles over the distinct-value grid.

    ``ranks`` is a list of ``(num, den, out_name)``: the num/den-th
    percentile is the smallest value where ``den * cw >= num * total``
    (percentile_disc semantics, exact for any integer weights). With
    ``weight`` None each row counts 1; otherwise rows contribute the
    weight column/expression (weighted percentiles, e.g. quantity-
    weighted price median). Returns one row per key:
    ``(*keys, total_name, *out_names)``; with ``keys`` empty, a single
    global row (the 1-row total rides a broadcast, not a global window).
    """
    wexpr = (
        F.count("*")
        if weight is None
        else F.sum(F.col(weight) if isinstance(weight, str) else weight)
    )
    grid = df.groupBy(*keys, value_col).agg(wexpr.cast("long").alias("__n"))
    tot = grid.groupBy(*keys).agg(F.sum("__n").cast("long").alias("__t"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.withColumn("__cw", F.sum("__n").over(w))
    cum = cum.join(tot, list(keys)) if keys else cum.crossJoin(F.broadcast(tot))
    aggs = [
        F.min(
            F.when(den * F.col("__cw") >= num * F.col("__t"), F.col(value_col))
        )
        .cast("long")
        .alias(name)
        for num, den, name in ranks
    ]
    out = [F.min("__t").cast("long").alias(total_name), *aggs]
    return cum.groupBy(*keys).agg(*out) if keys else cum.agg(*out)
