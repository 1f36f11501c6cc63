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
    direction: str = "backward",
    tiebreak: str | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` (``direction="backward"``, default), the
    earliest right row with ``right.ts >= left.ts``
    (``direction="forward"``), or whichever of those two is closest in
    absolute time (``direction="nearest"``; equidistant ties resolve
    BACKWARD) within the same ``on`` key group.

    Implementation (scale-first): tag and union both sides, then one window
    per key ordered by (ts, side) carrying ``last(right value, ignorenulls)``
    forward. The forward direction is the identical plan with the timestamp
    sort reversed — nearest-at-or-after becomes the carried value. Cost =
    one hash shuffle on ``on`` + in-partition sort — the same price as a
    regular join, with no inequality cross-product. Right rows at exactly
    ``left.ts`` match in both directions (ties resolve right-before-left in
    the sort).

    ``tiebreak`` names a right-side column that deterministically picks
    the winner when several right rows share the same (key, ts): the row
    with the MINIMUM tiebreak value is selected, in both directions.
    Without it, the winner among exact-duplicate timestamps depends on
    partition-internal order — unstable across partitionings and engines
    (DuckDB's native ASOF also picks arbitrarily there).

    ``tolerance_sec`` bounds the match distance (pandas ``merge_asof``
    tolerance): a selected right row farther than this from ``left.ts`` is
    masked to NULL (dropped under ``how="inner"``). Masking AFTER selection
    is equivalent to constraining the join: the as-of winner is by
    definition the nearest candidate in its direction, so if it misses the
    tolerance every other candidate does too. Implemented as a post-window
    projection — no change to the join's plan shape or cost.

    Returns ``left`` columns plus ``right_ts + suffix`` and each of
    ``right_cols`` suffixed.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    lcols = left.columns
    tb_type = right.schema[tiebreak].dataType if tiebreak else None
    tagged_r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__row"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("long")).alias("__tb"),
        F.struct(F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_cols]).alias("__rval"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    tagged_l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.monotonically_increasing_id().alias("__row"),
        F.lit(None).cast(tb_type or "long").alias("__tb"),
        F.lit(None).cast(tagged_r.schema["__rval"].dataType).alias("__rval"),
        *[F.col(c) for c in lcols if c not in on],
    )
    unioned = tagged_r.unionByName(tagged_l)

    # __tb DESC puts the minimum-tiebreak right row LAST among its equal-ts
    # group, so F.last selects it — the deterministic winner.
    def carried(asc: bool):
        order = F.col("__ts").asc() if asc else F.col("__ts").desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col("__side").asc(), F.col("__tb").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__rval", ignorenulls=True).over(w)

    if direction == "nearest":
        # both directions ride the SAME hash partitioning — one exchange,
        # two in-partition sorts; the nearer candidate wins, backward on
        # equidistant ties (and when either side has no candidate)
        b, fw = carried(True), carried(False)
        gap_b = F.unix_micros(F.col("__ts")) - F.unix_micros(b[right_ts])
        gap_f = F.unix_micros(fw[right_ts]) - F.unix_micros(F.col("__ts"))
        pick = (
            F.when(b.isNull(), fw)
            .when(fw.isNull(), b)
            .when(gap_f < gap_b, fw)
            .otherwise(b)
        )
        matched = unioned.withColumn("__match", pick).filter(F.col("__side") == 1)
    else:
        matched = unioned.withColumn(
            "__match", carried(direction == "backward")
        ).filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col(f"__match.{right_ts}"))
        )
        matched = matched.withColumn(
            "__match",
            F.when(gap <= F.lit(int(tolerance_sec * 1_000_000)), F.col("__match")),
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


def interval_overlap_self_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Keyed interval-OVERLAP self-join without a cartesian: pairs of rows
    under the same key whose [start, end) windows intersect
    (``s_a < e_b AND s_b < e_a`` — the two-sided predicate no equi-join can
    express directly).

    Mechanics: each interval explodes into the coarse ``bucket_days``-wide
    day buckets it spans; candidates come from an EQUI-join on
    (key, bucket) — overlapping intervals must share at least one bucket —
    then exact verification applies the overlap predicate and pairs that
    shared several buckets are deduplicated. Replication factor is
    ``ceil(interval_len / bucket_days) + 1`` per row (bounded, choose the
    bucket near the typical interval length); the join itself is a hash
    shuffle on (key, bucket). This is the scale-safe plan for temporal
    conflict detection (double-bookings, overlapping sessions, SCD sanity)
    — the naive theta-join plans as a per-key nested loop.

    Returns (key, id_a, id_b, overlap_seconds) with id_a < id_b, exact
    integer overlap length at second granularity (``datediff`` day
    truncation would silently miss same-day overlaps). Degenerate or
    inverted intervals (end <= start) contain no time and are dropped —
    without the guard, Spark's ``sequence`` steps BACKWARD for start >
    stop and an inverted row would explode into a bucket per
    ``bucket_days`` of the inversion span and join against everything it
    touches.
    """
    sd = F.unix_timestamp(F.col(start_col))
    ed = F.unix_timestamp(F.col(end_col))
    w = F.lit(bucket_days * 86_400)
    iv = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(id_col).alias("id"),
            sd.alias("sd"),
            ed.alias("ed"),
        )
        .filter(F.col("ed") > F.col("sd"))
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("sd") / w), F.floor((F.col("ed") - 1) / w)
                )
            ),
        )
    )
    a = iv.select(
        "key", "bucket",
        F.col("id").alias("id_a"), F.col("sd").alias("sd_a"), F.col("ed").alias("ed_a"),
    )
    b = iv.select(
        "key", "bucket",
        F.col("id").alias("id_b"), F.col("sd").alias("sd_b"), F.col("ed").alias("ed_b"),
    )
    return (
        a.join(b, ["key", "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sd_a") < F.col("ed_b"))
            & (F.col("sd_b") < F.col("ed_a"))
        )
        .select(
            "key", "id_a", "id_b",
            (
                F.least("ed_a", "ed_b") - F.greatest("sd_a", "sd_b")
            ).cast("long").alias("overlap_seconds"),
        )
        .dropDuplicates(["key", "id_a", "id_b"])
    )
