"""Greedy sequence packing: the Catalyst fold must agree with a plain
Python greedy reference, including the edge cases (zero-weight rows,
rows heavier than the budget)."""

import pytest

from dend_spark_data_lake_spark.operators.packing import greedy_pack, pack_stats


def _reference_pack(rows, budget, docs_per_shard):
    """Pure-Python greedy first-fit-in-order packing, per shard."""
    out = {}
    shards = {}
    for rid, w in sorted(rows):
        shards.setdefault(rid // docs_per_shard, []).append((rid, w))
    for shard, docs in shards.items():
        pack, acc = -1, budget + 1
        for rid, w in docs:
            if acc + w <= budget:
                acc += w
            else:
                pack, acc = pack + 1, w
            out[rid] = (shard, pack)
    return out


def test_greedy_pack_matches_python_reference(spark):
    rows = [
        (0, 10), (1, 0), (2, 30), (3, 5),     # zero-weight joins current pack
        (4, 100), (5, 1),                     # oversize opens + occupies its own pack
        (6, 12), (7, 13), (8, 14), (9, 2),
        (64, 31), (65, 32), (66, 33),         # second shard restarts at pack 0
        (70, 200), (71, 1),                   # oversize in shard 1
    ]
    budget, dps = 40, 64
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"])
        for r in greedy_pack(df, "doc_id", "w", budget, dps).collect()
    }
    assert got == _reference_pack(rows, budget, dps)


def test_pack_stats_fill_never_exceeds_budget_except_oversize(spark):
    rows = [(i, 7 + (i * 13) % 23) for i in range(200)]
    budget = 50
    df = spark.createDataFrame(rows, "doc_id long, w long")
    packed = greedy_pack(df, "doc_id", "w", budget, docs_per_shard=64)
    assert packed.count() == len(rows)  # every row assigned exactly once
    stats = pack_stats(packed, budget).collect()
    # all weights here are < budget, so no pack may overflow and every
    # pack except possibly the last of each shard is > half full
    assert all(r["tokens_used"] <= budget for r in stats)
    assert all(r["n_docs"] >= 1 for r in stats)


def test_bpe_train_no_pairs_returns_none(spark):
    """bpe_train on a vocabulary of single-character words (no adjacent
    pairs anywhere) must return (None, [v0]) — the edge the registry
    queries' empty-schema fallback guards."""
    from dend_spark_data_lake_spark.operators.packing import bpe_train

    v = spark.createDataFrame([("a", 3), ("b", 2)], "w string, f long")
    mt, stages = bpe_train(v, merges=3)
    assert mt is None
    assert len(stages) == 1
    assert {(r.w, r.f) for r in stages[0].collect()} == {("<a>", 3), ("<b>", 2)}


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_bpe_train_matches_replica_on_arbitrary_vocabs(spark):
    """Hypothesis fuzz of the full 3-merge training against the shared
    Python replica on arbitrary tiny-alphabet vocabularies — a 3-letter
    alphabet makes argmax TIES (count desc, then lexicographic on l then
    r) the COMMON case rather than a crafted edge, and multi-character
    merged symbols re-enter later tie-breaks — and the final
    word -> trained-symbol-count map must agree exactly on every
    generated vocabulary (the fixtures and crafted tie tests sample this
    space; the fuzz walks it)."""
    from hypothesis import given, settings, strategies as st

    from dend_spark_data_lake_spark.operators.packing import bpe_train
    from tests.test_properties import _bpe_train_replica

    @settings(max_examples=10, deadline=None)
    @given(
        st.dictionaries(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
            min_size=1,
            max_size=8,
        )
    )
    def run(vocab):
        v = spark.createDataFrame(list(vocab.items()), "w string, f long")
        _mt, stages = bpe_train(v, merges=3)
        got = {
            r.w.replace("<", "").replace(">", ""): len(r.w[1:-1].split("><"))
            for r in stages[-1].collect()
        }
        assert got == _bpe_train_replica(vocab)

    run()


def test_bpe_train_contract_violation_fails_loudly(spark):
    """ADVICE r9 (applied at the r11 rotation): the ^[a-z]+$ vocabulary
    contract is enforced IN-PLAN — a word carrying a delimiter or any
    out-of-contract character must raise at execution time instead of
    silently corrupting pair counts and merge tables. NULL words are out
    of contract too (rlike(NULL) is NULL -> the guard branch fires)."""
    import pytest

    from dend_spark_data_lake_spark.operators.packing import bpe_train

    for bad in ("a<b", "x>y", "Upper", "has space", "num3ric", None):
        v = spark.createDataFrame([(bad, 3), ("ok", 2)], "w string, f long")
        with pytest.raises(Exception, match="delimiter contract"):
            bpe_train(v, merges=1)
    # and the conforming vocabulary still trains exactly as before
    v = spark.createDataFrame([("aaa", 5)], "w string, f long")
    mt, stages = bpe_train(v, merges=1)
    assert [r.w for r in stages[1].collect()] == ["<aa><a>"]


def test_bpe_train_overlap_is_greedy_left_to_right(spark):
    """The BPE application rule on overlapping occurrences: 'aaa' with
    merge (a,a) becomes ('aa','a') — one application, not two — because
    the merge is a single non-overlapping left-to-right replace."""
    from dend_spark_data_lake_spark.operators.packing import bpe_train

    v = spark.createDataFrame([("aaa", 5)], "w string, f long")
    mt, stages = bpe_train(v, merges=1)
    [m] = mt.collect()
    assert (m.left_sym, m.right_sym, m.pair_n) == ("a", "a", 10)
    assert [r.w for r in stages[1].collect()] == ["<aa><a>"]


def test_bpe_train_merge_table_invariant_under_partition_forcing(spark):
    """The learned BPE merge table must be VALUE-identical under extreme
    shuffle-partition settings: pair counts are exact integer aggregates
    and the argmax tie-break (count desc, then lexicographic) is total,
    so no partitioning may change which pair wins."""
    from dend_spark_data_lake_spark.operators.packing import bpe_train
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    v = (
        d.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    tables = {}
    try:
        for parts in ("3", "64"):
            spark.conf.set(key, parts)
            mt, _ = bpe_train(v, merges=3)
            tables[parts] = [
                (r.merge_step, r.left_sym, r.right_sym, r.pair_n)
                for r in mt.orderBy("merge_step").collect()
            ]
    finally:
        spark.conf.set(key, orig)
    assert tables["3"] == tables["64"]
    assert len(tables["3"]) == 3
