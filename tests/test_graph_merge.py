"""Unit tests: connected components (operators/graph.py) and MERGE upsert
(operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dend_spark_data_lake_spark.operators.graph import connected_components
from dend_spark_data_lake_spark.operators.merge import merge_upsert


def test_connected_components_chain_and_islands(spark):
    # Components: {1,2,3,4} (a chain — needs >1 propagation round),
    # {10,11}, {20,21,22} (a triangle).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["src", "dst"],
    )
    got = {
        (r.vertex, r.component)
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_path_converges(spark):
    # Path 0-1-2-...-12: diameter 12 forces many label-propagation rounds;
    # all vertices must still land on component 0.
    n = 13
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    rows = connected_components(edges, "src", "dst").collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {0}


def test_merge_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "val"]
    )
    source = spark.createDataFrame(
        [(2, "b2", None), (9, "new", 90.0)],
        "k long, name string, val double",
    )
    out = {r.k: (r.name, r.val) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {
        1: ("a", 10.0),      # untouched target row passes through
        2: ("b2", None),     # matched: source wins per ROW — its NULL survives
        3: ("c", 30.0),
        9: ("new", 90.0),    # unmatched source row inserted
    }


def test_merge_upsert_schema_is_target_schema(spark):
    target = spark.createDataFrame([(1, "a")], ["k", "name"])
    source = spark.createDataFrame([(1, "z", "extra")], ["k", "name", "junk"])
    merged = merge_upsert(target, source, ["k"])
    assert merged.columns == ["k", "name"]
    assert merged.collect()[0].name == "z"


def _pagerank_replica(edges, iters, scale, damp):
    """Integer-exact Python replica of pagerank_quantized's spec."""
    out_w = {}
    for u, v, w in edges:
        out_w[u] = out_w.get(u, 0) + w
    verts = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(verts)
    teleport = (100 - damp) * scale // (100 * n)
    r = {v: scale // n for v in verts}
    for _ in range(iters):
        inflow = {v: 0 for v in verts}
        for u, v, w in edges:
            inflow[v] += r[u] * w // out_w[u]
        r = {v: teleport + damp * inflow[v] // 100 for v in verts}
    return r


def test_pagerank_quantized_matches_integer_replica(spark):
    from dend_spark_data_lake_spark.operators.graph import pagerank_quantized

    edges = [
        (1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5),
        (4, 1, 1),  # 4 has no in-edges -> must land exactly on teleport
        (2, 4, 1),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {
        r.vertex: r.rank_q
        for r in pagerank_quantized(df, iters=4, scale=10**9, damping_pct=85).collect()
    }
    want = _pagerank_replica(edges, iters=4, scale=10**9, damp=85)
    assert got == want
    # structural invariants: floor losses only ever shrink total mass
    assert sum(got.values()) <= 10**9
    # every vertex keeps at least the teleport mass
    teleport = 15 * 10**9 // (100 * len(want))
    assert all(v >= teleport for v in got.values())


def test_pagerank_rank_flows_to_sink(spark):
    """A two-node graph where everything points at node 2: node 2's rank
    must strictly exceed node 1's after one iteration."""
    from dend_spark_data_lake_spark.operators.graph import pagerank_quantized

    df = spark.createDataFrame([(1, 2, 1), (2, 2, 1)], ["src", "dst", "w"])
    got = {
        r.vertex: r.rank_q
        for r in pagerank_quantized(df, iters=3, scale=10**9).collect()
    }
    assert got[2] > got[1]


def test_pagerank_empty_edges_raises(spark):
    from dend_spark_data_lake_spark.operators.graph import pagerank_quantized
    import pytest as _pytest

    empty = spark.createDataFrame([], "src long, dst long, w long")
    with _pytest.raises(ValueError, match="empty"):
        pagerank_quantized(empty)


def test_pca_empty_vectors_raises(spark):
    from dend_spark_data_lake_spark.operators.decomposition import (
        pca_power_topvec_quantized,
    )
    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty"):
        pca_power_topvec_quantized(empty)
