"""SQL DDL/DML surface: CREATE TABLE USING parquet, INSERT INTO/OVERWRITE
with dynamic partition overwrite, and CACHE TABLE — the catalog-facing half
of lake management (the path-facing half lives in sources/io.py tests)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def clean_tables(spark):
    yield
    for t in ("sales", "sales_src"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_create_insert_and_dynamic_partition_overwrite(spark, tmp_path, clean_tables):
    loc = str(tmp_path / "sales_tbl")
    spark.sql(
        f"""
        CREATE TABLE sales (k INT, v STRING, day STRING)
        USING parquet PARTITIONED BY (day) LOCATION '{loc}'
        """
    )
    spark.sql("INSERT INTO sales VALUES (1, 'a', 'd1'), (2, 'b', 'd2')")
    assert spark.sql("SELECT count(*) FROM sales").collect()[0][0] == 2

    # dynamic partition overwrite: only day='d2' is replaced, d1 survives
    # (session.py sets spark.sql.sources.partitionOverwriteMode=dynamic)
    spark.sql("INSERT OVERWRITE sales VALUES (9, 'z', 'd2')")
    got = {(r.k, r.v, r.day) for r in spark.sql("SELECT * FROM sales").collect()}
    assert got == {(1, "a", "d1"), (9, "z", "d2")}

    # partition pruning works through the catalog table
    plan = (
        spark.sql("SELECT * FROM sales WHERE day = 'd1'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "d1" in plan


def test_insert_select_and_cache_table(spark, clean_tables):
    spark.sql("CREATE TABLE sales_src (k INT, v DOUBLE) USING parquet")
    spark.sql("INSERT INTO sales_src SELECT id, id * 1.5 FROM range(100)")
    spark.sql("CACHE TABLE sales_src")
    try:
        assert spark.catalog.isCached("sales_src")
        plan = (
            spark.sql("SELECT sum(v) FROM sales_src")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InMemory" in plan  # scan served from the cached relation
        assert spark.sql("SELECT count(*) FROM sales_src").collect()[0][0] == 100
    finally:
        spark.sql("UNCACHE TABLE sales_src")
