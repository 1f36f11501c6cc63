"""Join operators beyond plain ``df.join``.

The reference uses two inner equi-joins (SURVEY.md §2.1 J1/J2,
``/root/reference/etl_pipeline.py:259-274``); those need no wrapper — use
``df.join``. This module adds the joins Spark has no single primitive for,
built so they scale:

- ``broadcast_dim_join`` — explicit broadcast of a small dimension.
- ``asof_join``          — as-of (most-recent-prior match), via the
  union+window technique: one shuffle on the key, no range explosion.
- ``bucketed_range_join`` — interval join on a time/number range, bucketed so
  it executes as an *equi*-join on the bucket id instead of a
  BroadcastNestedLoop cross product (which is O(n*m) and unusable at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact x small-dimension join with an explicit broadcast hint.

    At 100 TB the fact side must never shuffle for a kB-to-GB dimension;
    ``F.broadcast`` pins BroadcastHashJoin regardless of stat estimates.
    """
    return fact.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key group.

    Implementation (scale-first): tag and union both sides, then one window
    per key ordered by (ts, side) carrying ``last(right value, ignorenulls)``
    forward. Cost = one hash shuffle on ``on`` + in-partition sort — the same
    price as a regular join, with no inequality cross-product. Right rows at
    exactly ``left.ts`` match (ties resolve right-before-left in the sort).

    Returns ``left`` columns plus ``right_ts + suffix`` and each of
    ``right_cols`` suffixed.
    """
    on = list(on)
    lcols = left.columns
    tagged_r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__row"),
        F.struct(F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_cols]).alias("__rval"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    tagged_l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.monotonically_increasing_id().alias("__row"),
        F.lit(None).cast(tagged_r.schema["__rval"].dataType).alias("__rval"),
        *[F.col(c) for c in lcols if c not in on],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rval", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    out = matched.select(
        *[F.col(c) for c in on],
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        F.col(f"__match.{right_ts}").alias(right_ts + suffix),
        *[F.col(f"__match.{c}").alias(c + suffix) for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col(right_ts + suffix).isNotNull())
    return out


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_expr: str,
    upper_expr: str,
    bucket_seconds: int,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Range join ``right.ts BETWEEN left.lower AND left.upper`` executed as an
    equi-join on time buckets.

    Each left row is exploded to the bucket ids its [lower, upper] interval
    covers (interval width should be O(bucket_seconds), so the explosion
    factor is a small constant); the join then runs as a hash join on
    (bucket, *extra_on) and the exact range predicate filters the residue.
    This turns an O(n*m) nested-loop into a shuffle join — the standard
    interval-bucketing trick, required at 100 TB where Spark's fallback for
    pure inequality joins is BroadcastNestedLoop.

    ``lower_expr``/``upper_expr`` are SQL expressions over ``left`` columns.
    """
    bsec = F.lit(bucket_seconds)
    l = (
        left.withColumn("__lo", F.expr(lower_expr))
        .withColumn("__hi", F.expr(upper_expr))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    (F.unix_timestamp("__lo") / bsec).cast("long"),
                    (F.unix_timestamp("__hi") / bsec).cast("long"),
                )
            ),
        )
    )
    r = right.withColumn("__bucket", (F.unix_timestamp(right_ts) / bsec).cast("long"))
    cond = [l["__bucket"] == r["__bucket"]] + [l[c] == r[c] for c in extra_on]
    joined = l.join(r, cond, "inner").filter(
        (r[right_ts] >= l["__lo"]) & (r[right_ts] <= l["__hi"])
    )
    keep = [l[c] for c in left.columns] + [
        r[c] for c in right.columns if c not in set(extra_on)
    ]
    return joined.select(*keep)


def salted_equi_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    salt_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: identical results to ``skewed.join(other,
    on, how)``, but a hot key's rows spread over ``n_salts`` shuffle
    partitions.

    The skewed (probe) side gets a deterministic salt in [0, n_salts)
    hashed from ``salt_cols`` (default: all its columns, so co-equal rows
    still spread); the other side is replicated ``n_salts`` times via
    explode; the shuffle key becomes ``(*on, __salt)``. Replication costs
    n_salts x the *small* side only — use AQE skew-join first, salting when
    a single key exceeds what one task can hold even after AQE splits.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_equi_join supports inner/left joins")
    salt_src = [F.col(c) for c in (salt_cols or skewed.columns)]
    left = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int")
    )
    right = other.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")
