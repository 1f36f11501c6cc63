"""Property-based checks (hypothesis) for operator invariants that must
hold on ANY input, not just the fixtures — SURVEY.md §5.2 item 4.

Spark round-trips are expensive, so examples are capped and deadlines
disabled; the properties target the invariants that would corrupt data
silently at scale if a refactor broke them.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dend_spark_data_lake_spark.operators import sampling as SAMP

# ---------------------------------------------------------------------------
# Pure-Python properties (fast, many examples)
# ---------------------------------------------------------------------------


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_hex_monotone_and_bounded(f):
    t = SAMP.threshold_hex(f)
    assert len(t) == SAMP.PREFIX_DIGITS and t <= "ffff"
    # monotone: a larger fraction never yields a smaller threshold
    assert SAMP.threshold_hex(min(1.0, f + 0.1)) >= t


@given(
    st.lists(
        st.floats(min_value=0.01, max_value=0.5, allow_nan=False), min_size=1, max_size=4
    )
)
def test_split_label_weights_cover_unit_interval(ws):
    total = sum(ws)
    weights = {f"s{i}": w / max(total, 1.0) for i, w in enumerate(ws)}
    # cumulative thresholds are nondecreasing and the last label absorbs the rest
    cum, prev = 0.0, "0000"
    for label, w in list(weights.items())[:-1]:
        cum += w
        t = SAMP.threshold_hex(cum)
        assert t >= prev
        prev = t


# ---------------------------------------------------------------------------
# Spark properties (few examples, session reused)
# ---------------------------------------------------------------------------

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (forces collisions)
        st.integers(min_value=0, max_value=100),  # ts
        st.text(alphabet="abc ", min_size=0, max_size=12),  # payload
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(ROWS)
def test_keyed_dedup_invariants(spark, rows):
    """keep-latest: ≤1 row per key, and it carries the max ts for the key
    (ties broken deterministically — reruns give byte-identical output)."""
    from dend_spark_data_lake_spark.operators.dedup import dedup_keep_latest

    df = spark.createDataFrame(rows, "k int, ts int, v string")
    out = dedup_keep_latest(df, ["k"], "ts", tie_break=["v"]).collect()
    assert len({r.k for r in out}) == len(out)  # unique keys
    by_key_max = {}
    for k, ts, _ in rows:
        by_key_max[k] = max(by_key_max.get(k, -1), ts)
    for r in out:
        assert r.ts == by_key_max[r.k]
    again = dedup_keep_latest(df, ["k"], "ts", tie_break=["v"]).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@settings(max_examples=10, deadline=None)
@given(ROWS)
def test_normalize_text_idempotent(spark, rows):
    from pyspark.sql import functions as F
    from dend_spark_data_lake_spark.functions.text import normalize_text

    df = spark.createDataFrame(rows, "k int, ts int, v string")
    once = normalize_text("v")
    bad = df.select(
        once.alias("a"), normalize_text(once).alias("b")
    ).filter(F.col("a") != F.col("b"))
    assert bad.count() == 0


@settings(max_examples=10, deadline=None)
@given(ROWS)
def test_word_ngrams_shape(spark, rows):
    """Every emitted shingle has exactly n tokens; short docs emit none."""
    from pyspark.sql import functions as F
    from dend_spark_data_lake_spark.functions.similarity import word_ngrams

    df = spark.createDataFrame(rows, "k int, ts int, v string")
    sh = df.select(F.explode(word_ngrams(F.col("v"), 3)).alias("s"))
    bad = sh.filter(F.size(F.split(F.col("s"), r"\s+")) != 3)
    assert bad.count() == 0


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=40))
def test_sample_subset_property(spark, n):
    """A 30% hash sample is a strict subset of the 60% sample on any key
    range — nested thresholds must nest row sets (enables reproducible
    progressive sampling at scale)."""
    df = spark.range(n).withColumnRenamed("id", "k")
    small = {r.k for r in SAMP.deterministic_sample(df, "k", 0.3).collect()}
    big = {r.k for r in SAMP.deterministic_sample(df, "k", 0.6).collect()}
    assert small <= big
