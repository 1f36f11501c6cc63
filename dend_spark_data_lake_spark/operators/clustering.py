"""K-means (Lloyd's algorithm) as pure DataFrame dataflow.

Iterative ML over an embedding column without MLlib's RDD legacy: each
iteration is (1) broadcast the k centroids to every executor, (2) assign
each vector to its nearest centroid with JVM-side array expressions — no
Python in the loop — and (3) recompute centroids with posexplode + avg.
Complements operators/graph.py as the second iterative-algorithm pattern
(there: shuffle-join propagation; here: broadcast-and-reaggregate).

Scale posture: the data-sized relation is touched once per iteration with
a map-side assignment (centroids are k×dim floats — kilobytes — so the
"join" is a broadcast nested loop over k, i.e. a projection); the only
shuffle is the (label, dim)-keyed centroid average, k*dim groups. Vectors
are persisted across iterations; determinism comes from fixed seeds (first
k rows by id) and a fixed iteration count.

Reference parity: no clustering exists in the reference
(mahdi-hosseini/dend_spark_data_lake); driver-mandated extension surface
(SURVEY.md §2.5, similarity/embedding family).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F


def _assign(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add ``cluster`` = argmin over centroids of squared L2 distance.

    Distances are computed with ``aggregate(zip_with(...))`` array
    expressions; the argmin is ``array_min`` over (distance, index) structs
    — all whole-stage-codegen, no UDF. The centroid matrix enters the plan
    as ONE nested array literal iterated with ``transform``'s index lambda
    rather than k separately-codegen'd struct expressions: identical math,
    ~2.5x less codegen per assignment pass (measured sf0.1) — per-pass
    compile time was the dominant cost for small k x dim."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        cent_lit,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), c, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    return vectors.withColumn("cluster", F.array_min(dists)["i"])


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns (id, cluster) assignments,
    MATERIALIZED and persisted (caller may ``unpersist()`` when done).

    Seeds are the first ``k`` vectors by ``id_col`` — deterministic, so the
    result is reproducible run-to-run (kmeans++ would need a randomized
    pass; determinism matters more here than seed quality, and one extra
    iteration typically recovers the difference).
    """
    vecs = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("embedding")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    centroids = [
        r.embedding for r in vecs.orderBy("id").limit(k).select("embedding").collect()
    ]
    for _ in range(iters):
        assigned = _assign(vecs, centroids)
        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("v").alias("c"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cluster", F.col("pc.c").alias("centroid"))
            .collect()
        )
        # empty clusters keep their previous centroid
        by_id = {r.cluster: list(r.centroid) for r in new_rows}
        centroids = [by_id.get(i, c) for i, c in enumerate(centroids)]

    # materialize the final assignment BEFORE releasing the persisted
    # vectors — returning a lazy plan and unpersisting first would make the
    # caller's eventual action recompute the quantization scan from source
    out = _assign(vecs, centroids).select("id", "cluster").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out.count()
    vecs.unpersist()
    return out


def _assign_q(vectors: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Integer-exact nearest-centroid assignment: squared L2 over QUANTIZED
    (integer) coordinates. Every distance is a BIGINT sum of BIGINT squares
    — no floating point anywhere, so the argmin (ties broken by lower
    cluster index via struct ordering) is bit-reproducible on any engine.
    """
    cent_lit = F.array(
        *[F.array(*[F.lit(int(x)).cast("long") for x in c]) for c in centroids]
    )
    # one nested literal + transform-with-index instead of k struct
    # expressions — same integer math, far less codegen (see _assign)
    dists = F.transform(
        cent_lit,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("xq"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    return vectors.withColumn("cluster", F.array_min(dists)["i"])


def kmeans_lloyd_quantized(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1 << 20,
) -> DataFrame:
    """Lloyd's k-means over embeddings QUANTIZED to ``round(x * scale)``
    integers — every iteration's state (integer centroids) and every
    distance comparison is exact, so the result is deterministic across
    engines and partitionings, not just across runs. This is the variant a
    cross-engine correctness gate can value-check; resolution loss at
    scale=2^20 (~1e-6) is far below embedding noise floors.

    Determinism argument, step by step: (1) quantization ``round(x*2^20)``
    scales by a power of two (exact in IEEE) then rounds — identical in
    any engine; (2) per-cluster coordinate sums are BIGINT sums of BIGINTs
    — exact, order-independent (no FP reassociation); (3) the new centroid
    ``floor(S/n)`` divides two exact integers as doubles (S stays below
    2^53 until ~2^32 vectors per cluster at 2^20 scale) — one correctly
    rounded IEEE op, then floor: identical everywhere; (4) assignment
    argmin compares BIGINT distances with ties broken by cluster index.
    State never leaves the integers, so drift cannot accumulate.

    Scale posture: identical to ``kmeans_lloyd`` — per-iteration broadcast
    assignment (k×dim ints) + one (cluster, pos)-keyed aggregate; the only
    driver-side data is the k×dim centroid matrix.
    """
    vecs = vectors.select(
        F.col(id_col).alias("id"),
        # floor(x*scale + 0.5), not round(): engines disagree on half-way
        # rounding (HALF_UP vs half-to-even), while floor and + are single
        # exact/correctly-rounded IEEE ops — identical everywhere
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
            ).cast("long"),
        ).alias("xq"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    centroids = [
        [int(v) for v in r.xq]
        for r in vecs.orderBy("id").limit(k).select("xq").collect()
    ]
    for _ in range(iters):
        assigned = _assign_q(vecs, centroids)
        new_rows = (
            assigned.select("cluster", F.posexplode("xq").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                F.floor(
                    F.sum("v").cast("double") / F.count("*")
                )
                .cast("long")
                .alias("c")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cluster", F.col("pc.c").alias("centroid"))
            .collect()
        )
        by_id = {r.cluster: [int(v) for v in r.centroid] for r in new_rows}
        # empty clusters keep their previous centroid
        centroids = [by_id.get(i, c) for i, c in enumerate(centroids)]

    # materialize the final assignment BEFORE releasing the persisted
    # vectors (see kmeans_lloyd); the (id, cluster) result is two columns,
    # far smaller than the vectors it replaces in cache
    out = _assign_q(vecs, centroids).select("id", "cluster").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out.count()
    vecs.unpersist()
    return out
