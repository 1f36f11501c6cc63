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
