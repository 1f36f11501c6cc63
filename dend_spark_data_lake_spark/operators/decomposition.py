"""Quantized power iteration: the dominant principal direction of an
embedding matrix as pure DataFrame dataflow — iterative algorithm #3
(after graph.connected_components / graph.pagerank_quantized and
clustering.kmeans_lloyd_quantized), with the same exact-cross-engine
contract: all iteration state is integer, so an unrolled SQL oracle
replays it bit-for-bit (queries.py::_pca_oracle_sql).

The uncentered top right-singular direction is computed (the driver
testdata embeddings are zero-centered by construction; centering would
add one subtraction of a per-dimension integer mean — exact — but is
omitted to keep the overflow ledger below simple).

Per iteration, two matvecs and one normalization, never materializing
the d x d covariance:
    y_i  = <x_i, v>            (per-row dot product, map-side)
    ys_i = y_i DIV scale        (downshift keeps the next sum in range)
    z_j  = sum_i x_ij * ys_i    (one keyed aggregate over the exploded matrix)
    v'_j = z_j * scale DIV max|z|   (renormalize to |v| <= scale)

Integer-division portability: Spark's ``DIV`` and DuckDB's ``//`` BOTH
truncate toward zero (verified for negative operands), so every division
above is engine-exact even on negative components; Python's ``//``
floors, so the driver-side normalization routes through abs().

Overflow ledger (scale = 2^20, d = 64): |xq| <~ 2^20, |v| <= 2^20 →
|y| <= d * 2^40 = 2^46; ys <= 2^26; each z term <= 2^46, so n rows fit in
int64 up to n ~ 2^16. For larger relations raise the downshift (scale the
ys division up) — the ledger, not the dataflow, is what changes.

Scale posture: the quantized matrix is persisted once; per iteration the
data-sized relation is touched twice (one map-side dot product against a
BROADCAST 64-int direction, one keyed sum producing 64 rows); only the
64-element direction vector ever reaches the driver — the same
centroid-sized-state contract as kmeans.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F


def pca_power_topvec_quantized(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 4,
    scale: int = 1 << 20,
) -> DataFrame:
    """Return the dominant principal direction as 64 rows
    ``(pos, component_q)`` with ``max|component_q| == scale`` (the max
    component hits the scale exactly; all arithmetic integer-exact).

    Starts from the all-ones direction (deterministic; the sign of the
    result follows deterministically from it)."""
    vecs = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(scale)) + F.lit(0.5)
            ).cast("long"),
        ).alias("xq"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    first = vecs.select("xq").first()
    if first is None:
        vecs.unpersist()
        raise ValueError("pca_power_topvec_quantized: vector relation is empty")
    dim = len(first[0])
    v = [scale] * dim
    for _ in range(iters):
        # F.lit(list) here is cosmetic — it desugars to the same
        # CreateArray tree and constant-folds to one Literal either way
        # (see clustering._assign)
        varr = F.lit([int(c) for c in v]).cast("array<bigint>")
        # ys_i derives from row i alone (ydot DIV scale), so both matvecs
        # fuse into ONE map-side pass over the cached matrix — the old
        # form joined vecs back to a y-relation on id, paying two
        # exchanges per iteration for values already on the row
        z_rows = (
            vecs.withColumn(
                "ydot",
                F.aggregate(
                    F.zip_with(F.col("xq"), varr, lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
            .withColumn("ys", F.expr(f"ydot DIV {scale}"))
            .select(F.posexplode("xq").alias("pos", "x"), "ys")
            .groupBy("pos")
            .agg(F.sum(F.col("x") * F.col("ys")).alias("z"))
            .collect()
        )
        z = [0] * dim
        for r in z_rows:
            z[r.pos] = int(r.z)
        m = max(abs(c) for c in z)
        if m == 0:  # degenerate all-zero matrix
            break
        # truncating division to match Spark DIV / DuckDB // semantics
        # (Python // floors, hence the abs routing)
        v = [(abs(c) * scale // m) * (1 if c >= 0 else -1) for c in z]

    out = vecs.sparkSession.createDataFrame(
        [(i, int(c)) for i, c in enumerate(v)], "pos int, component_q long"
    )
    vecs.unpersist()
    return out
