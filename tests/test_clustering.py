"""K-means: the DataFrame implementation must agree with a NumPy replica of
the identical algorithm (same seeds, same iteration count) — determinism is
part of the operator's contract."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE
from dend_spark_data_lake_spark.operators.clustering import kmeans_lloyd
from dend_spark_data_lake_spark.sources.io import read_table


def _numpy_lloyd(ids, X, k, iters):
    order = np.argsort(ids)
    seed_idx = order[:k]
    centroids = X[seed_idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            if (assign == j).any():
                centroids[j] = X[assign == j].mean(axis=0)
    d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def test_kmeans_matches_numpy_replica(spark):
    em = read_table(spark, SF_SMOKE, "embeddings")
    rows = em.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)

    got = {r.id: r.cluster for r in kmeans_lloyd(em, k=8, iters=3).collect()}
    want = dict(zip(ids.tolist(), _numpy_lloyd(ids, X, 8, 3).tolist()))
    mismatches = sum(1 for i in got if got[i] != want[i])
    # FP-order differences could flip a near-tie assignment; demand exact
    # agreement on >=99% and identical cluster count.
    assert mismatches <= max(1, len(got) // 100), mismatches
    assert set(got.values()) == set(want.values())


def test_kmeans_clusters_partition_all_vectors(spark):
    em = read_table(spark, SF_SMOKE, "embeddings")
    out = kmeans_lloyd(em, k=4, iters=2)
    assert out.count() == em.count()
    assert out.select("id").distinct().count() == em.count()
    assert out.select("cluster").distinct().count() <= 4


def test_kmeans_quantized_partitions_and_is_deterministic(spark):
    """The quantized variant must partition every vector and be exactly
    reproducible run-to-run — bit-determinism is its whole contract (the
    value-level check against an independent engine is the DuckDB oracle
    on kmeans_clusters; a float-trajectory comparison is NOT meaningful
    because Lloyd amplifies near-tie flips across iterations)."""
    from dend_spark_data_lake_spark.operators.clustering import (
        kmeans_lloyd_quantized,
    )

    em = read_table(spark, SF_SMOKE, "embeddings")
    out = kmeans_lloyd_quantized(em, k=4, iters=2)
    n = em.count()
    assert out.count() == n
    assert out.select("id").distinct().count() == n
    assert out.select("cluster").distinct().count() <= 4
    again = {
        r.id: r.cluster
        for r in kmeans_lloyd_quantized(
            em.repartition(7), k=4, iters=2
        ).collect()
    }
    first = {r.id: r.cluster for r in out.collect()}
    assert first == again  # exact, even under a different partitioning


def test_pca_power_topvec_matches_integer_replica(spark):
    """pca_power_topvec_quantized must agree with a pure-Python integer
    replica of its spec (truncating division throughout), and on data
    stretched along one axis the dominant component must be that axis."""
    from dend_spark_data_lake_spark.operators.decomposition import (
        pca_power_topvec_quantized,
    )

    # 6 points strongly spread along dim 1, mild noise on dims 0/2
    rows = [
        (1, [0.01, 0.50, -0.02, 0.0]),
        (2, [-0.02, -0.48, 0.01, 0.0]),
        (3, [0.03, 0.45, 0.02, 0.0]),
        (4, [-0.01, -0.52, -0.01, 0.0]),
        (5, [0.02, 0.49, 0.00, 0.0]),
        (6, [-0.03, -0.46, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    scale, iters = 1 << 20, 3
    got = {
        r.pos: r.component_q
        for r in pca_power_topvec_quantized(df, iters=iters, scale=scale).collect()
    }

    # integer replica (truncating division: Python // floors, so negatives
    # route through abs)
    import math

    xq = [[math.floor(x * scale + 0.5) for x in emb] for _, emb in rows]
    dim = 4
    v = [scale] * dim
    for _ in range(iters):
        ys = []
        for r_ in xq:
            y = sum(a * b for a, b in zip(r_, v))
            ys.append(y // scale if y >= 0 else -((-y) // scale))
        z = [0] * dim
        for r_, yv in zip(xq, ys):
            for j in range(dim):
                z[j] += r_[j] * yv
        m = max(abs(c) for c in z)
        v = [(abs(c) * scale // m) * (1 if c >= 0 else -1) for c in z]
    assert got == dict(enumerate(v))
    # dominant axis is dim 1 and it hits the scale exactly
    assert abs(got[1]) == scale
    assert all(abs(got[j]) < scale // 4 for j in (0, 2, 3))


def test_pq_train_codebook_invariant_under_partition_forcing(spark):
    """The trained PQ codebook must be VALUE-identical under extreme
    shuffle-partition settings — the determinism property every
    cross-engine certificate in the family stands on (the scale tier
    proves plan-shape invariance; this proves the trajectory itself).
    Seeds come from a TakeOrdered, assignments from literal projections,
    updates from exact integer aggregation — none may depend on
    partitioning."""
    from dend_spark_data_lake_spark.operators.clustering import (
        pq_train_quantized,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    books = {}
    try:
        for parts in ("3", "64"):
            spark.conf.set(key, parts)
            codes, cb = pq_train_quantized(emb, m=4, k=8, iters=2)
            books[parts] = cb
            codes.unpersist()
    finally:
        spark.conf.set(key, orig)
    assert books["3"] == books["64"]
