"""Data-quality rules must count exactly the planted violations."""

from __future__ import annotations

from dend_spark_data_lake_spark.operators import quality as DQ


def test_rules_count_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "X"),
            (2, None, -5.0, "Y"),   # null name, out-of-range, bad status
            (2, "c", 20.0, "X"),    # duplicate key
            (9, "d", 30.0, None),   # bad status (NULL), orphan fk
        ],
        "k long, name string, val double, status string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    out = {
        r.rule: r.n_violations
        for r in DQ.check(
            df,
            [
                DQ.not_null("name"),
                DQ.in_range("val", 0, 100),
                DQ.in_set("status", ["X", "Y"]),
                DQ.UniqueRule("unique(k)", ["k"]),
                DQ.ForeignKeyRule("fk(k->ref)", ["k"], ref, ["k"]),
            ],
        ).collect()
    }
    assert out == {
        "not_null(name)": 1,
        "in_range(val,0,100)": 1,
        "in_set(status)": 1,
        "unique(k)": 1,
        "fk(k->ref)": 1,
    }


def test_clean_data_passes_all_rules(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    out = DQ.check(df, [DQ.not_null("k", "name"), DQ.UniqueRule("u", ["k"])])
    assert all(r.n_violations == 0 for r in out.collect())


def test_row_rules_fuse_into_single_aggregate(spark):
    # all row-level rules must share ONE scan/aggregate — rule count must
    # not multiply passes over a 100-TB table
    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    plan = (
        DQ.check(df, [DQ.not_null("k"), DQ.in_range("v", 0, 10), DQ.in_set("k", [1])])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2
