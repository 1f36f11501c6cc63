"""Distributed connected components over an edge DataFrame.

The piece that turns near-duplicate PAIRS (similarity.py) into dedup
CLUSTERS: docs {a,b}, {b,c} are one duplicate group even though (a,c) was
never emitted as a pair. At 100 TB the pair relation does not fit on the
driver, so clustering must itself be a dataflow — this module implements
iterative min-label propagation with per-round lineage truncation.

Reference parity: the reference (mahdi-hosseini/dend_spark_data_lake) has
no graph/dedup-cluster surface; this is part of the driver-mandated
LLM-pipeline extension (SURVEY.md §2.5, fuzzy dedup).

Scale notes:
- The symmetric edge relation is deduplicated and checkpointed ONCE; each
  round is then one propagation join (the label side broadcasts when
  small, both sides shuffle under SMJ otherwise — AQE checkpoints report
  UnknownPartitioning, so cross-round partition reuse is NOT available;
  round 15 removed the repartition that assumed it was) plus ONE grouped
  min over labels ∪ propagated labels. The vertex's own label rides the
  union branch, which removes the old join→min→left-join-back round shape
  (3 exchanges → 2, one of which AQE turns into a broadcast).
- Rounds needed = graph diameter. Near-dup clusters are dense (diameter
  2-4 in practice), so the loop terminates in a handful of rounds; the
  ``max_rounds`` guard bounds pathological chains.
- ``localCheckpoint`` after every round truncates the logical plan —
  without it the plan doubles per iteration and Catalyst analysis time
  dominates by round ~8. On a real cluster with HDFS, ``checkpoint()``
  (reliable) is the production choice; local mode uses the block-store
  variant.
- Convergence is detected from ``sum(label)``: labels only ever decrease,
  so the sum is strictly monotone until fixpoint — one cheap aggregate per
  round instead of a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id of its connected component.

    Returns ``(vertex, component)``; isolated vertices never appear in
    ``edges`` and therefore are not returned (callers keep them implicitly
    — see ``dedup_corpus``).
    """
    one = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Dedup BEFORE the symmetric union: the distinct exchange then carries
    # each edge once instead of twice (guide §2.3 — same result set; an
    # input that already holds both orientations of a pair keeps both,
    # which only widens the propagation fan-out on those edges, never the
    # labels). NO repartition after: under AQE a checkpointed plan reports
    # UnknownPartitioning (AdaptiveSparkPlanExec does not expose its final
    # partitioning), so the old repartition("u") was a full extra edge
    # shuffle that no later round could actually reuse — verified against
    # the executed round plans (round joins broadcast the label side at
    # bench scale and re-exchange both sides under SMJ regardless).
    # lazy: materialized by the first convergence-sum job below (together
    # with the initial labels) instead of its own eager job
    sym = one.dropDuplicates()
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)

    # LAZY localCheckpoint: the convergence-sum collect below is the first
    # action, so ONE job both materializes the round's checkpoint blocks
    # and reduces the scalar — the eager form paid a separate
    # materialization job per round (2 jobs/round -> 1, measured ~25%
    # faster end-to-end on the dedup composites at sf0.1)
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .dropDuplicates()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=False)
    )
    # No init-sum job: round 1 is compared against a sentinel instead —
    # on any graph with a real (two-endpoint) edge, round 1 strictly
    # lowers the sum, so the init collect only ever confirmed "not yet
    # converged" at the price of one extra driver barrier per call. An
    # empty edge relation yields sum NULL, caught explicitly.
    prev_sum: object = object()

    converged = False
    for _ in range(max_rounds):
        # component'(v) = min(component(v), min over neighbors u of
        # component(u)). Formulated as union + ONE grouped min (2 exchanges)
        # rather than join -> grouped min -> left join back (3 exchanges):
        # the vertex's own label rides the union branch, so the left-join
        # coalesce is unnecessary.
        prop = sym.join(labels, sym["u"] == labels["vertex"]).select(
            F.col("v").alias("vertex"), "component"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        # first action on the lazy checkpoint: materializes the round's
        # blocks AND reduces the convergence scalar in one job
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum or cur_sum is None:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Exiting via max_rounds means propagation stopped before the
        # fixpoint: a component whose diameter exceeds max_rounds would be
        # returned with MULTIPLE labels — silently wrong dedup clusters.
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; the graph has a component with a longer path — "
            "raise max_rounds"
        )
    return labels


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank over INTEGER-quantized ranks — deterministic
    across engines and partitionings, so an iterative graph algorithm can
    carry a full value-level SQL oracle (the same trick as
    ``clustering.kmeans_lloyd_quantized``; unrolled-CTE replay in
    ``queries._pagerank_oracle_sql``).

    Semantics, all in exact BIGINT arithmetic:
    - ``r_0(v) = scale // N`` for each of the N vertices (src ∪ dst);
    - each iteration, vertex u sends ``r(u) * w(u,v) // out_w(u)`` along
      every out-edge (floor division — mass from dangling-free floor
      remainders is dropped, identically on every engine);
    - ``r'(v) = teleport + damping_pct * inflow // 100`` with
      ``teleport = (100 - damping_pct) * scale // (100 * N)``. Vertices
      with no in-edges land exactly on ``teleport``.

    Scale posture: the edge relation (with out-degree weights precomputed)
    is checkpointed once; each iteration
    moves only the rank relation through one join + one keyed sum — ranks
    stay DISTRIBUTED, never collected to the driver (unlike centroids,
    ranks are data-sized on real graphs). ``localCheckpoint`` truncates
    the per-round lineage. Overflow bound: rank*weight must stay below
    2^63 — at scale=1e12 that allows per-edge weights to ~9e6; normalize
    heavier edge weights before calling.

    Returns ``(vertex, rank_q)`` with ``sum(rank_q) <= scale`` (floor
    losses make it slightly below).
    """
    e = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        F.col(weight).cast("long").alias("w"),
    )
    out_w = e.groupBy("u").agg(F.sum("w").alias("ow"))
    # lazy checkpoints: the vertex count below is the first action and
    # materializes BOTH block sets in one job (eager form: one job each).
    # No repartition before the checkpoint: AQE checkpoints report
    # UnknownPartitioning, so the iteration joins could never reuse it
    # (see connected_components) — it was one wasted edge shuffle.
    e = e.join(out_w, "u").localCheckpoint(eager=False)

    verts = (
        e.select(F.col("u").alias("vertex"))
        .union(e.select(F.col("v").alias("vertex")))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    n = verts.count()
    if n == 0:
        raise ValueError("pagerank_quantized: edge relation is empty")
    teleport = (100 - damping_pct) * scale // (100 * n)
    ranks = verts.withColumn("rank_q", F.lit(scale // n).cast("long"))

    for _ in range(iters):
        inflow = (
            e.join(ranks, e["u"] == ranks["vertex"])
            .select(
                F.col("v").alias("vertex"),
                F.expr("CAST(rank_q * w AS BIGINT) DIV ow").alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            verts.join(inflow, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"CAST({damping_pct} * coalesce(inflow, 0) AS BIGINT) DIV 100"
                    )
                ).cast("long").alias("rank_q"),
            )
            # lazy: each round still truncates lineage (the logical plan
            # becomes a scan of the checkpoint RDD immediately). Under AQE
            # the per-round toRdd still finalizes the plan — the round's
            # SHUFFLE stages do run here — but the result stage (and the
            # block write) is deferred to the caller's single action
            # instead of a separate eager materialization job per round
            .localCheckpoint(eager=False)
        )
    return ranks
