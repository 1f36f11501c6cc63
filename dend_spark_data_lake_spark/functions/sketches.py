"""Mergeable sketch aggregates (Apache DataSketches, built into Spark 3.5+/4).

The 100-TB answer to "how many distinct / what quantile / how frequent":
exact answers need a full shuffle of the raw keys, sketches need one pass
plus a tiny merge — and, critically, sketches are REUSABLE: persist the
per-partition (or per-day) sketch once, then answer rollups over any
partition subset by merging kilobytes instead of rescanning terabytes.

Reference parity: the reference has no approximate surface at all; this
extends SURVEY.md §2.5's ``approx_count_distinct`` row to the full sketch
algebra the driver's 100-TB posture wants:

- HLL      — distinct counts, unions only.
- Theta    — distinct counts with full set algebra (union / intersection /
             difference on the *sketches*), i.e. scalable INTERSECT/EXCEPT
             cardinalities.
- KLL      — rank/quantile estimates with proven error bounds.
- KPS      — heavy hitters via ``stat.freqItems`` (one-pass counters).

Estimates are engine-specific (DataSketches internals), so queries over
these are rows-only checked by the driver; tests/test_sketches.py instead
locks the two properties that matter: bounded error vs the exact answer,
and partition-merge associativity (merge of per-group sketches == global
sketch — the property that makes them work on 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, group: str, value: str, lg_k: int = 12) -> DataFrame:
    """Per-group HLL distinct-count estimate, carrying the sketch itself so
    callers can roll groups up later with ``hll_union_agg`` (no rescan)."""
    return df.groupBy(group).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias("hll_sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value), F.lit(lg_k))
        ).alias("n_distinct_est"),
    )


def hll_rollup(per_group: DataFrame, sketch_col: str = "hll_sketch") -> DataFrame:
    """Union per-group sketches into one global distinct estimate — the
    merge side of the sketch contract (kilobytes, not a rescan)."""
    return per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "n_distinct_est"
        )
    )


def theta_set_cardinalities(
    df: DataFrame, value: str, cond_a: Column, cond_b: Column
) -> DataFrame:
    """|A|, |B|, |A∪B|, |A∩B|, |A\\B| estimates via Theta sketches, where A/B
    are the ``value`` populations under two predicates. The set algebra runs
    on the SKETCHES — this is how you answer "users who did X but not Y"
    over 100 TB without shuffling user ids even once."""
    pair = df.agg(
        F.theta_sketch_agg(F.when(cond_a, F.col(value))).alias("sa"),
        F.theta_sketch_agg(F.when(cond_b, F.col(value))).alias("sb"),
    )
    return pair.select(
        F.round(F.theta_sketch_estimate(F.col("sa"))).cast("long").alias("n_a"),
        F.round(F.theta_sketch_estimate(F.col("sb"))).cast("long").alias("n_b"),
        F.round(F.theta_sketch_estimate(F.theta_union(F.col("sa"), F.col("sb"))))
        .cast("long")
        .alias("n_union"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection(F.col("sa"), F.col("sb")))
        )
        .cast("long")
        .alias("n_intersect"),
        F.round(F.theta_sketch_estimate(F.theta_difference(F.col("sa"), F.col("sb"))))
        .cast("long")
        .alias("n_a_minus_b"),
    )


def kll_quantiles(
    df: DataFrame, value: str, probs: list[float], k: int = 200
) -> DataFrame:
    """Quantile estimates from one KLL sketch pass (vs the exact
    ``percentile`` which sorts every group). Returns one row with one
    column per requested quantile."""
    sk = F.kll_sketch_agg_double(F.col(value), F.lit(k))
    return df.agg(sk.alias("s")).select(
        *[
            F.kll_sketch_get_quantile_double(F.col("s"), F.lit(p)).alias(
                f"q{int(p * 100)}"
            )
            for p in probs
        ]
    )


def heavy_hitters(df: DataFrame, cols: list[str], support: float = 0.01) -> DataFrame:
    """Approximate heavy hitters (items with frequency > support) via the
    one-pass Karp-Papadimitriou-Shenker counter behind ``stat.freqItems`` —
    the streaming-memory answer to "what dominates this column" before
    deciding on skew salting. May contain false positives, never false
    negatives; returns one row of ``<col>_freqItems`` arrays."""
    return df.stat.freqItems(cols, support)


def bloom_positions(key: Column, k: int = 3, m: int = 1024) -> Column:
    """The k Bloom-filter bit positions of ``key``: an array of
    ``md5("{i}:" || key)`` buckets mod m, i = 0..k-1 — the same
    derandomized "{i}:key" md5 hash family the CMS / MinHash / SRP
    pipelines use, so the filter contents (and therefore the exact
    false-positive set, not just its expected rate) are reproducible in
    any engine. DuckDB replica per position:
    ``CAST(concat('0x', substr(md5('{i}:' || CAST(key AS VARCHAR)), 1, 8))
    AS BIGINT) % m``.

    The relational Bloom representation is the DISTINCT set of inserted
    positions (<= m rows, one BIGINT each) rather than a packed bitmap:
    semantically identical, broadcast-join-able, and engine-portable —
    the bitmap packing is an executor-local micro-optimization Spark's own
    runtime bloom filters already apply underneath.
    """
    c = key.cast("string")
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), c)), 1, 8), 16, 10
            ).cast("long")
            % m
            for i in range(k)
        ]
    )
