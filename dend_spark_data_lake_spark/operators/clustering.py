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
    compile time was the dominant cost for small k x dim.

    The ``F.lit(nested_list)`` spelling is purely cosmetic: classic
    PySpark desugars it to the same ``array(array(...))`` tree as the
    explicit ``CreateArray`` form, and Catalyst constant-folds BOTH to one
    array Literal — the canonicalized optimized plans are byte-identical
    (verified, round 15). The round-14 comment claiming a per-iteration
    Janino-compile saving here was wrong; either spelling compiles the
    same generated code."""
    cent_lit = F.lit([[float(x) for x in c] for c in centroids]).cast(
        "array<array<double>>"
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
    # F.lit(nested_list) is cosmetically equivalent to the CreateArray
    # tree (both constant-fold to one Literal — see _assign)
    cent_lit = F.lit([[int(x) for x in c] for c in centroids]).cast(
        "array<array<bigint>>"
    )
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


def _assign_pq(
    subs: DataFrame, codebook: list[list[list[int]]]
) -> DataFrame:
    """Integer-exact nearest-code assignment for product quantization:
    ``subs`` carries one row per (vector, subspace) with the quantized
    sub-vector ``sub``; ``codebook[s][j]`` is code j of subspace s. The
    whole m x k x sub_dim codebook enters the plan as ONE nested array
    literal indexed by the row's subspace id (``element_at``), so the
    assignment is a pure projection — no join, no shuffle — and every
    distance is a BIGINT sum of BIGINT squares (ties broken by lower code
    index via struct ordering), bit-reproducible on any engine."""
    # F.lit(nested_list) is cosmetically equivalent to the CreateArray
    # tree (both constant-fold to one Literal — see _assign)
    cb_lit = F.lit(
        [[[int(x) for x in c] for c in per_s] for per_s in codebook]
    ).cast("array<array<array<bigint>>>")
    dists = F.transform(
        F.element_at(cb_lit, F.col("s") + 1),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("sub"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("i"),
        ),
    )
    best = F.array_min(dists)
    return subs.withColumn("code", best["i"]).withColumn("d2", best["d"])


def pq_train_quantized(
    vectors: DataFrame,
    m: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1024,
) -> tuple[DataFrame, list[list[list[int]]]]:
    """Train a product-quantization codebook: ``m`` independent k-means
    runs, one per subspace of ``dim/m`` consecutive components, executed
    as ONE grouped dataflow (every per-iteration job covers all m
    subspaces — the subspace id is just another group key, not a loop).
    Closes the documented stand-in in embed_pq_distortion (md5-derived
    codebook) with a codebook actually fitted to the corpus.

    Same exactness contract as ``kmeans_lloyd_quantized``: components
    quantize to ``floor(x*scale + 0.5)`` integers, distances and centroid
    sums are BIGINT-exact, new centroids are ``floor(S/n)`` computed — on
    BOTH engines — as the IEEE double division ``floor(S::double / n)``,
    one correctly-rounded op that is exact while ``|S| < 2^53`` (at
    scale=1024 that binds around ~2^43 vectors per (s, code, pos) group;
    beyond it both engines still round identically, so the cross-engine
    TRAJECTORY certificate holds — what the bound scopes is agreement
    with true integer floor division, NOT engine parity). Do not "fix"
    this to integer DIV: it would desync the certified trajectory from
    the unrolled oracle replay wherever the double rounding differs.
    Empty codes keep their previous centroid, and the assignment argmin
    tie-breaks on the code index — so the full training trajectory
    replays exactly in ANSI SQL (the ``embed_pq_codebook_train`` DuckDB
    oracle, whose centroid CTE uses the same double division).

    Returns ``(assignments, codebook)``: assignments is the MATERIALIZED
    persisted (id, s, code, d2) frame (caller may ``unpersist()``);
    codebook is the trained ``[m][k][dim/m]`` integer list — k*dim ints,
    driver-bounded regardless of corpus size.

    Scale posture: the data-sized relation is the exploded (vector,
    subspace) stream, m rows per vector; each iteration touches it once
    with a literal-indexed projection (no join) and one combinable
    (s, code, pos)-keyed aggregate of m*k*sub_dim groups. Driver state is
    the k*dim-int codebook per iteration — never data-sized."""
    vecs = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
            ).cast("long"),
        ).alias("xq"),
    )
    seed_rows = vecs.orderBy("id").limit(k).select("xq").collect()
    assert len(seed_rows) == k, f"need >= {k} vectors to seed the codebook"
    dim = len(seed_rows[0].xq)
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sd = dim // m
    subs = (
        vecs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("int").alias("s"),
                            F.slice("xq", s * sd + 1, sd).alias("sub"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("e"),
        )
        .select("id", "e.s", "e.sub")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    codebook = [
        [[int(v) for v in r.xq[s * sd : (s + 1) * sd]] for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(iters):
        assigned = _assign_pq(subs, codebook)
        new_rows = (
            assigned.select("s", "code", F.posexplode("sub").alias("pos", "v"))
            .groupBy("s", "code", "pos")
            .agg(
                F.floor(F.sum("v").cast("double") / F.count("*"))
                .cast("long")
                .alias("c")
            )
            .groupBy("s", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("s", "code", F.col("pc.c").alias("centroid"))
            .collect()
        )
        upd = {(r.s, r.code): [int(v) for v in r.centroid] for r in new_rows}
        # empty codes keep their previous centroid
        codebook = [
            [upd.get((s, j), codebook[s][j]) for j in range(k)]
            for s in range(m)
        ]

    # materialize the final assignment BEFORE releasing the persisted
    # sub-vector stream (see kmeans_lloyd) — (id, s, code, d2) is four
    # narrow columns, far smaller than the sub-vectors it replaces
    out = (
        _assign_pq(subs, codebook)
        .select("id", "s", "code", "d2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    subs.unpersist()
    return out, codebook


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
