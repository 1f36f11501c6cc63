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

Cache lifetime (ADVICE r8): global_cumulative_counts / distributed_ntile /
global_running_max each ``persist()`` their range-partitioned frame — the
determinism fix — and CANNOT unpersist it themselves (the returned frame is
lazy; the caller's action happens after this function returns). The cached
relation lives until session end or ``spark.catalog.clearCache()``. Grids
here are distinct-value-domain-sized (not row-sized), so one leak is small,
but long multi-query sessions should clear between queries the way
``tools/oracle_sweep.py`` does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _nondeterministic_lineage(df: DataFrame) -> list[str]:
    """Best-effort scan of ``df``'s analyzed plan for nondeterminism:
    expressions Catalyst marks nondeterministic (rand/uuid/
    monotonically_increasing_id/nondeterministic UDFs) and Sample nodes
    (seeded, but partition-layout-sensitive under re-evaluation).
    Returns offender descriptions, empty when the lineage is safe.

    The pid-window rewrite evaluates its input TWICE (offsets branch +
    final join) and relies on both evaluations agreeing row-for-row —
    the round-7 chained-window bug was exactly a violation of this, so
    the invariant is enforced structurally here rather than documented
    per call site. Introspection failures return [] (never block a
    caller on a py4j API drift)."""
    try:
        bad: list[str] = []

        def walk(p) -> None:
            exprs = p.expressions()
            for i in range(exprs.size()):
                e = exprs.apply(i)
                if not e.deterministic():
                    bad.append(e.sql())
            if p.nodeName() == "Sample":
                bad.append("Sample (partition-layout-sensitive)")
            ch = p.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

        walk(df._jdf.queryExecution().analyzed())
        return bad
    except Exception:  # pragma: no cover - py4j API drift safety valve
        return []


def _require_deterministic(df: DataFrame, caller: str) -> None:
    bad = _nondeterministic_lineage(df)
    if bad:
        raise ValueError(
            f"{caller}: input lineage is nondeterministic under "
            f"re-evaluation ({', '.join(sorted(set(bad))[:5])}); the "
            "pid-window rewrite evaluates it twice and the two "
            "evaluations must agree row-for-row. Pass "
            "assume_deterministic=False to pin one evaluation via "
            "localCheckpoint, or derive the grid deterministically."
        )


def global_cumulative_counts(
    grid: DataFrame,
    value_col: str,
    weight_col: str | Sequence[str],
    n_parts: int = 32,
    cum_name: str | Sequence[str] = "__cw",
    total_name: str | Sequence[str] = "__t",
    assume_deterministic: bool = True,
) -> DataFrame:
    """Distributed GLOBAL cumulative weights over a (value, weight) grid
    — no unpartitioned window over the grid, so the distinct-value
    domain may be unbounded (per-customer sums, arbitrary-precision
    prices) without collapsing onto one task.

    Technique (same as customer_ltv_deciles' two-pass ntile, VERDICT r4):
    range-partition the grid on the value, cumulate WITHIN each range
    partition (pid-keyed window), then add each partition's prefix
    offset from a ~n_parts-row broadcast table; the only unpartitioned
    window runs over that bounded offset table. Returns the grid rows
    plus ``cum_name`` (cumulative weight through this value) and
    ``total_name`` (grand total) — exactly what an unpartitioned
    ``sum(w) OVER (ORDER BY value)`` + full-frame total would produce.

    ``weight_col`` / ``cum_name`` / ``total_name`` also accept matched
    SEQUENCES to cumulate several weights in ONE pass (one repartition,
    one pid window). Multi-weight callers (two-sample CDFs, left/right
    label counts) MUST use this instead of chaining two calls: nesting
    one pid-window output inside another's range-repartition defeats
    Spark's exchange reuse, and the offsets/join branches can then
    re-evaluate the inner plan with DIFFERENT pid assignments — caught
    at sf0.1 as a nondeterministic KS statistic (round 7).

    ``grid`` must be DETERMINISTIC under re-evaluation (ADVICE r5): the
    partitioned frame is evaluated twice — once for the offsets branch,
    once for the final join — and the global ranks rely on the
    RangePartitioner sampling and pid assignment agreeing across both.
    Every current call site feeds deterministic parquet-derived frames.
    For a frame containing ``rand()``/``sample()``/a non-deterministic
    UDF, pass ``assume_deterministic=False`` to pin one evaluation via
    ``localCheckpoint`` (eager, materializes the grid) before fan-out.
    """
    weights = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    cums = [cum_name] if isinstance(cum_name, str) else list(cum_name)
    totals = [total_name] if isinstance(total_name, str) else list(total_name)
    assert len(weights) == len(cums) == len(totals), "mismatched weight naming"
    if assume_deterministic:
        _require_deterministic(grid, "global_cumulative_counts")
    p = grid.repartitionByRange(n_parts, value_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(value_col)
    local = p
    for i, w in enumerate(weights):
        local = local.withColumn(
            f"__lcw{i}",
            F.sum(w).over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
        )
    if not assume_deterministic:
        local = local.localCheckpoint()
    # Persist the pid-assigned frame so the offsets branch and the final
    # join consume ONE materialization. Without it the two branches hold
    # structurally different range exchanges whenever the grid carries
    # columns beyond the cumulated weights (column pruning narrows the
    # offsets branch), exchange reuse does NOT fire, and each branch
    # re-samples its own RangePartitioner boundaries — pids then disagree
    # and the global offsets are garbage (observed: ±1% rank-sum drift at
    # a 15k-value grid; the round-7 multi-weight rewrite fixed one shape
    # of this, persist kills the class). Eviction is safe: recompute
    # replays the SAME RDD lineage, so boundaries are reproduced. A
    # localCheckpoint (escape-hatch path) already IS a materialization,
    # so persisting on top would just store a second copy.
    if assume_deterministic:
        local = local.persist()
    sizes = local.groupBy("__pid").agg(
        *[F.sum(w).cast("long").alias(f"__pn{i}") for i, w in enumerate(weights)]
    )
    w_off = Window.orderBy("__pid")  # bounded: one row per range partition
    offs = sizes.select(
        "__pid",
        *[
            c
            for i in range(len(weights))
            for c in (
                F.coalesce(
                    F.sum(f"__pn{i}").over(
                        w_off.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__off{i}"),
                F.sum(f"__pn{i}")
                .over(
                    w_off.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                )
                .cast("long")
                .alias(totals[i]),
            )
        ],
    )
    out = local.join(F.broadcast(offs), "__pid")
    for i, cn in enumerate(cums):
        out = out.withColumn(
            cn, (F.col(f"__off{i}") + F.col(f"__lcw{i}")).cast("long")
        )
    return out.drop(
        "__pid", *[f"__lcw{i}" for i in range(len(weights))],
        *[f"__off{i}" for i in range(len(weights))],
    )


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: Sequence[str],
    out_col: str = "ntile",
    n_parts: int = 32,
    assume_deterministic: bool = True,
) -> DataFrame:
    """Exact ``ntile(n)`` over an unpartitioned total order WITHOUT a
    global sort — the scale-correct replacement for
    ``ntile(n) OVER (ORDER BY ...)``, which collapses the relation onto
    one task.

    Two-pass plan (VERDICT r4 ask #2; certified hash-identical to the
    window form by customer_ltv_deciles' oracle parity at three SFs):

    1. range-partition on the full sort key (RangePartitioner — a
       sample-sized shuffle);
    2. rank within each range partition (pid-keyed window);
    3. global rank = local rank + broadcast per-partition prefix offset
       (the only unpartitioned window runs over the ~n_parts-row offset
       table);
    4. closed-form ntile bucket of (rank, N): the first ``N % n``
       buckets take ``N DIV n + 1`` rows, the rest ``N DIV n`` — exactly
       the SQL ntile definition, ties split by the sort key like the
       window's ORDER BY would.

    The sort key should be a total order (append a unique id) so output
    is deterministic. Adds ``out_col`` (int); drops no input columns.
    Column names prefixed ``__`` are reserved scratch space here (as in
    ``global_cumulative_counts``) — don't pass frames that carry them.

    ``df`` must be DETERMINISTIC under re-evaluation (ADVICE r5; see
    ``global_cumulative_counts``) — the ranked frame feeds both the
    sizes branch and the final join. For non-deterministic inputs pass
    ``assume_deterministic=False`` (eager ``localCheckpoint``).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if assume_deterministic:
        _require_deterministic(df, "distributed_ntile")
    part = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    local = part.withColumn("__lr", F.row_number().over(w_local).cast("long"))
    if not assume_deterministic:
        local = local.localCheckpoint()
    # single materialization for both branches — see the persist note in
    # global_cumulative_counts (pruning-asymmetric branches defeat
    # exchange reuse and re-sample range boundaries independently;
    # a localCheckpoint already materializes, so don't double-cache)
    if assume_deterministic:
        local = local.persist()
    sizes = local.groupBy("__pid").agg(F.count("*").cast("long").alias("__cnt"))
    w_off = Window.orderBy("__pid")  # bounded: one row per range partition
    offs = sizes.select(
        "__pid",
        F.coalesce(
            F.sum("__cnt").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("__off"),
        F.sum("__cnt")
        .over(w_off.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("long")
        .alias("__N"),
    )
    k = int(n_buckets)
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn("__r", (F.col("__off") + F.col("__lr")).cast("long"))
        .withColumn(
            out_col,
            F.expr(
                f"""
                CAST(CASE
                  WHEN __r <= (__N % {k}) * (__N DIV {k} + 1)
                    THEN (__r + __N DIV {k}) DIV (__N DIV {k} + 1)
                  ELSE __N % {k}
                       + (__r - (__N % {k}) * (__N DIV {k} + 1)
                          + __N DIV {k} - 1) DIV (__N DIV {k})
                END AS INT)
                """
            ),
        )
        .drop("__pid", "__lr", "__off", "__N", "__r")
    )


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
    if keys:
        tot = grid.groupBy(*keys).agg(F.sum("__n").cast("long").alias("__t"))
        w = (
            Window.partitionBy(*keys)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = grid.withColumn("__cw", F.sum("__n").over(w)).join(tot, list(keys))
    else:
        # keyless: the global grid may be unbounded (arbitrary distinct
        # values), so cumulate distributed instead of via an
        # unpartitioned window — see global_cumulative_counts
        cum = global_cumulative_counts(grid, value_col, "__n")
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


def global_running_max(
    grid: DataFrame,
    value_col: str,
    agg_col: str,
    n_parts: int = 32,
    cum_name: str = "__cmax",
    inclusive: bool = True,
    assume_deterministic: bool = True,
) -> DataFrame:
    """Distributed GLOBAL running maximum of ``agg_col`` over ``grid``
    ordered by ``value_col`` — the max-monoid sibling of
    global_cumulative_counts, same rewrite (range-partition, pid-keyed
    local window, broadcast per-partition prefix offsets; the only
    unpartitioned window runs over the bounded ~n_parts-row offset
    table), so the value domain may be unbounded.

    ``inclusive=False`` yields the strict-prefix maximum (max over rows
    ordered BEFORE this one; NULL for the global first row) — the form
    skyline/frontier tests need. The grid must be deterministic under
    re-evaluation (same contract as global_cumulative_counts; enforced
    by the same structural lineage check) — for a legitimately
    nondeterministic grid pass ``assume_deterministic=False`` to pin one
    evaluation via an eager ``localCheckpoint`` (ADVICE r8: this helper
    previously advertised that escape hatch without offering it).
    """
    if assume_deterministic:
        _require_deterministic(grid, "global_running_max")
    p = grid.repartitionByRange(n_parts, value_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    if not assume_deterministic:
        p = p.localCheckpoint()
    # single materialization for both branches — see the persist note in
    # global_cumulative_counts (here the local-max branch and the sizes
    # branch both re-evaluate the range exchange; a localCheckpoint
    # already materializes, so don't double-cache)
    if assume_deterministic:
        p = p.persist()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    local = p.withColumn("__lmx", F.max(agg_col).over(w_local))
    sizes = p.groupBy("__pid").agg(F.max(agg_col).alias("__pmx"))
    # bounded: one row per range partition
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select("__pid", F.max("__pmx").over(w_off).alias("__off"))
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(cum_name, F.greatest("__lmx", "__off"))
        .drop("__pid", "__lmx", "__off")
    )
