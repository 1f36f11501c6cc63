"""Similarity search and near-duplicate detection (SURVEY.md §2.5).

Scale posture per operator:

- ``cosine_topk`` — brute-force exact baseline: broadcast the (small) query
  set against the full corpus; dot products run JVM-side via
  ``zip_with``/``aggregate`` (no Python). Exact answer, one pass over the
  corpus, no shuffle of the corpus itself. The scale path for huge query
  sets is LSH/IVF bucketing (``minhash_lsh_pairs`` shows the LSH pattern;
  an IVF variant would k-means the corpus and prune by centroid).
- ``ngram_jaccard_pairs`` — exact n-gram-Jaccard near-dup: explode shingles,
  self-join on shingle. The shingle join is an equi-join (hash shuffle on
  the shingle), with a frequency cap to stop hot shingles exploding —
  the standard inverted-index trick.
- ``minhash_lsh_pairs`` — MinHash+LSH banding via ``spark.ml``'s
  ``MinHashLSH``: candidate pairs only collide within a band bucket, so the
  cross product never materializes.
- ``simhash64`` — 64-bit SimHash from token hashes with pure Spark
  expressions (xxhash64 + bit votes); near-pairs by banded equality on
  16-bit chunks then exact Hamming filter.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector over the corpus.

    Returns (query_id, neighbor_id, cosine, rank). Cosine is computed in
    double precision and rounded; ranking orders by (rounded cosine desc,
    neighbor id) so results are fully deterministic across engines.
    """
    # Norms are precomputed per SIDE, not per pair: sqrt(dot(v, v)) is the
    # same expression on the same row either way (bit-identical doubles),
    # but per-pair evaluation pays the O(dim) self-dot |queries| x |corpus|
    # times instead of |queries| + |corpus| — 3 higher-order aggregates per
    # pair collapse to 1 (guide §2.3: do per-row work once, not per pair).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qv"),
    ).withColumn("__qn", F.sqrt(_dot(F.col("__qv"), F.col("__qv"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__cv"),
    ).withColumn("__cn", F.sqrt(_dot(F.col("__cv"), F.col("__cv"))))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = pairs.select(
        "query_id", "neighbor_id", F.round(cos, round_digits).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def word_ngrams(col, n: int = 3):
    """Distinct word n-gram shingles of lowercased text, as an array column.

    The token array is bound to a lambda variable (``transform`` over a
    singleton array) so the ``split`` runs ONCE per row — naively inlining
    it into each per-shingle expression re-splits the text O(shingles)
    times per row (measured ~25x slowdown), because Catalyst's projection
    collapsing re-inlines deterministic expressions.

    Each shingle is ``array_join(slice(tokens, i, n))`` — one array op per
    shingle instead of n ``element_at`` lookups (~30% faster, measured).
    The index sequence is guarded with ``when(size >= n)`` because
    ``sequence(1, 0)`` is DESCENDING in Spark ([1, 0]) — an unguarded
    bound would feed ``slice`` position 0 (ANSI error) on docs shorter
    than n tokens.
    """
    toks = F.split(F.lower(F.trim(col if not isinstance(col, str) else F.col(col))), r"\s+")

    def grams(t):
        idx = F.when(F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - n + 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))

    return F.array_distinct(F.flatten(F.transform(F.array(toks), grams)))


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin-repartition ``df`` to the session's default parallelism
    when its plan has FEWER partitions than cores — the guide-§2.5 "input
    skew" fix for the local/small-file case where a whole expensive
    per-row stage (shingling, md5 MinHash signatures) would otherwise run
    as ONE task on one core (a single-row-group parquet file cannot be
    split, whatever maxPartitionBytes says).

    Scale-adaptive by construction: a 100 TB input arrives in thousands of
    scan partitions, so the condition is false and this is a no-op — no
    shuffle is ever added to a properly partitioned input. The shuffle it
    does add on small inputs moves the raw rows once, BEFORE the expensive
    projection (measured: the byte cost is trivial next to the 32x
    parallelism on the shingle/signature pass).

    The partition count is probed from the PRE-ADAPTIVE physical plan
    (``sparkPlan``), which builds the RDD DAG without submitting jobs —
    ``df.rdd`` would wrap the ADAPTIVE plan, and finalizing that under AQE
    eagerly RUNS any upstream shuffle stages (and re-analyzes the plan)
    at DataFrame-build time (ADVICE r14). Callers pass raw scans today,
    but the helper no longer depends on that.
    """
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    n_parts = (
        df._jdf.queryExecution().sparkPlan().execute().getNumPartitions()
    )
    if n_parts < p:
        return df.repartition(p)
    return df


def _jaccard_verify(
    cand: DataFrame,
    sa: DataFrame,
    sb: DataFrame,
    a_key: str,
    b_key: str,
    threshold: float,
    round_digits: int,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs with the
    ``array_intersect`` evaluated ONCE per pair.

    The intersection sits inside an ``explode(array(struct(...)))``
    Generate: the ``>= threshold`` filter references generator output,
    which Catalyst cannot push below the Generate into the join
    condition. Without the barrier the pushed predicate makes the join
    condition AND the post-join projection each evaluate
    ``array_intersect`` — 3 evaluations per candidate (no whole-stage
    codegen subexpression elimination reaches a join condition), measured
    ~2x slower verify at sf0.1. The explode emits exactly one row per
    input row, so the relation is unchanged.

    Returns (a_key, b_key, jaccard) filtered at ``threshold``.
    """
    j = cand.join(sa, a_key).join(sb, b_key)
    scored = j.select(
        a_key,
        b_key,
        F.explode(
            F.array(
                F.struct(
                    F.size(F.array_intersect("sh_a", "sh_b")).alias("ni"),
                    F.size("sh_a").alias("na"),
                    F.size("sh_b").alias("nb"),
                )
            )
        ).alias("v"),
    ).select(
        a_key,
        b_key,
        F.round(
            F.col("v.ni") / (F.col("v.na") + F.col("v.nb") - F.col("v.ni")),
            round_digits,
        ).alias("jaccard"),
    )
    return scored.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact near-duplicate pairs by Jaccard similarity of word n-grams,
    via prefix filtering (PPJoin-style).

    A naive inverted-index self-join is quadratic in the bucket size of hot
    shingles (a 5k-doc corpus over a small vocabulary already costs ~30s;
    100 TB would never finish). Prefix filtering keeps the result *exact*
    while joining only rare shingles:

    1. order all shingles globally by (corpus frequency, shingle);
    2. per doc of size m, index only its first ``floor((1-t)*m)+1`` shingles
       in that order — if J(A,B) >= t the two prefixes must share a shingle;
    3. candidate pairs come from an equi-join of the small prefix relation
       with itself (plus a size-ratio bound: J >= t implies m_a >= t*m_b,
       plus PPJoin's positional filter: matching at prefix positions
       (r_a, r_b) caps the overlap at ``min(m_a-r_a, m_b-r_b)+1``, which
       must reach the minimum overlap ``ceil(t/(1+t)*(m_a+m_b))`` — at
       t=0.5 this prunes ~40% of candidates before the verify join);
    4. verify candidates exactly with ``array_intersect`` on the full
       shingle sets.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, J rounded.
    """
    sets, ranked = _shingle_prefix_index(docs, id_col, text_col, n)
    prefix = (
        ranked.filter(F.col("r") <= F.floor((1 - F.lit(threshold)) * F.col("m")) + 1)
        .select("id", "sh", "m", "r")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # joined with itself below — persist so the freq join + window run once,
    #    not once per self-join side. Measured (sf0.1, clean JVM each):
    #    both persists 5.24s; prefix persist dropped (exchange-reuse only)
    #    5.54s; no persists 6.08s — the second persist stays.
    a = prefix.select(
        F.col("id").alias("doc_a"), "sh", F.col("m").alias("m_a"), F.col("r").alias("r_a")
    )
    b = prefix.select(
        F.col("id").alias("doc_b"), "sh", F.col("m").alias("m_b"), F.col("r").alias("r_b")
    )
    min_overlap = F.ceil(
        F.lit(threshold) / (1 + F.lit(threshold)) * (F.col("m_a") + F.col("m_b"))
    )
    overlap_cap = F.least(F.col("m_a") - F.col("r_a"), F.col("m_b") - F.col("r_b")) + 1
    cand = (
        a.join(b, "sh")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("m_a") >= F.lit(threshold) * F.col("m_b"))
            & (F.col("m_b") >= F.lit(threshold) * F.col("m_a"))
            & (overlap_cap >= min_overlap)
        )
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sa = sets.select(F.col("id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sets.select(F.col("id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return _jaccard_verify(
        cand, sa, sb, "doc_a", "doc_b", threshold, round_digits
    )


def _shingle_prefix_index(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> tuple[DataFrame, DataFrame]:
    """Shared prefix-filter machinery for the exact set-similarity joins
    (``ngram_jaccard_pairs`` symmetric, ``containment_pairs`` asymmetric).

    Returns ``(sets, ranked)``: ``sets`` is the persisted
    (id, hashed-shingle-array) relation — shingling is the most expensive
    per-row expression, computed once and MEMORY_AND_DISK-persisted because
    every caller consumes it 3x (index side(s) + both verify sides);
    ``ranked`` is the exploded (id, m, sh, r) relation where ``r`` is the
    shingle's rank within its doc in the GLOBAL (corpus frequency, value)
    order — the order that makes any prefix the doc's rarest shingles, so
    prefix equi-joins stay off hot shingles. Callers apply their own
    threshold-specific prefix bound on ``r``.

    Shingle strings are hashed to 64-bit longs immediately: downstream
    shuffles, sorts, and intersections work on fixed-width longs (~35%
    faster end-to-end, measured); set relations over hashes equal those
    over strings barring a 64-bit collision inside one corpus (~n²/2⁶⁵).

    The non-empty filter is applied ABOVE the persist boundary: pushed
    below it, Catalyst evaluates the full shingling expression TWICE per
    row while materializing the cache (once in the pushed Filter, once in
    the Project — higher-order functions get no whole-stage codegen, so
    no subexpression elimination rescues it; measured 1.55x slower at
    sf0.1). Cached rows with empty shingle arrays are a negligible
    overhead; the filter itself runs on the cached array column.
    """
    # NOT spread via _spread_small_input: the xxhash64 shingle pass is
    # cheap enough that the round-robin shuffle of the raw text costs more
    # than the parallelism buys (measured +20% at sf0.1) — unlike the
    # md5-signature path in _portable_shingle_bands, which wins 18%.
    cached = docs.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_ngrams(F.col(text_col), n), lambda s: F.xxhash64(s)
        ).alias("shingles"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sets = cached.filter(F.size("shingles") > 0)
    sh = sets.select(
        "id", F.size("shingles").alias("m"), F.explode("shingles").alias("sh")
    )
    # corpus frequency via a count window rather than groupBy+join: the
    # exploded relation must shuffle by sh either way (a sort-merge join on
    # sh exchanges the same rows), but the window form skips materializing
    # and re-joining the freq relation — one fewer full-size exchange
    # (measured ~8% faster end-to-end at sf0.1, byte-identical results)
    ranked = sh.withColumn(
        "f", F.count("*").over(Window.partitionBy("sh"))
    ).withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("f").asc(), F.col("sh").asc())
        ),
    )
    return sets, ranked


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_ppm: int = 900_000,
) -> DataFrame:
    """Exact near-CONTAINMENT pairs: documents whose word-n-gram shingle set
    is >= threshold contained in another document's set — the excerpt /
    quotation / partial-mirror duplicates that symmetric Jaccard misses (a
    short doc fully quoted inside a long one has high containment but low
    Jaccard, because the union is dominated by the long doc).

    Candidate generation is the ASYMMETRIC prefix filter: the emitted score
    is ``n_shared * 1e6 DIV m >= t_ppm``, which (floor division against an
    integer bound) is equivalent to ``n_shared >= ceil(t_ppm·m / 1e6)`` —
    so at most ``m - ceil(t_ppm·m/1e6)`` of A's shingles are missing from B
    and A's first ``m - ceil(t_ppm·m/1e6) + 1`` shingles in the global
    (frequency, value) order must intersect B. The bound is computed in
    INTEGER arithmetic (``(t_ppm·m + 999999) DIV 1e6``), not float — a
    float threshold slightly above t would shorten the prefix by one for
    sizes where t·m is exact and silently drop at-threshold pairs. Only the
    CONTAINED side is pruned to its prefix; the container side indexes all
    its shingles. The equi-join is still rare-shingle-biased — prefix
    shingles are each doc's rarest — so hot shingles stay off the pruned
    side. Verification is exact ``array_intersect`` on the full sets, and
    the score is integer ppm (no float comparison anywhere).

    Orientation: the contained doc is the one with the SMALLER shingle set
    (ties: lower id); each qualifying pair is emitted once as
    (doc_inner, doc_outer, n_inner, n_outer, n_shared, containment_ppm).
    """
    sets, ranked = _shingle_prefix_index(docs, id_col, text_col, n)
    # minimum shared shingles for containment: ceil(t_ppm * m / 1e6), all-integer.
    # The multiply MUST be 64-bit: m is a 32-bit F.size output, and
    # t_ppm * m overflows INT at m >= ~2388 (a ~2400-word doc) — under
    # Spark 4's default ANSI mode that aborts the job with
    # ARITHMETIC_OVERFLOW; with ANSI off it silently corrupts the prefix
    # bound and drops pairs.
    min_shared = F.expr(
        f"(CAST({int(threshold_ppm)} AS BIGINT) * m + 999999) DIV 1000000"
    )
    inner_prefix = ranked.filter(
        F.col("r") <= F.col("m") - min_shared + 1
    ).select(F.col("id").alias("doc_inner"), "sh", F.col("m").alias("m_i"))
    sh = sets.select(
        "id", F.size("shingles").alias("m"), F.explode("shingles").alias("sh")
    )
    outer_all = sh.select(
        F.col("id").alias("doc_outer"), "sh", F.col("m").alias("m_o")
    )
    cand = (
        inner_prefix.join(outer_all, "sh")
        .filter(
            (F.col("doc_inner") != F.col("doc_outer"))
            & (F.col("m_i") <= F.col("m_o"))
        )
        .select("doc_inner", "doc_outer")
        .dropDuplicates()
    )
    si = sets.select(F.col("id").alias("doc_inner"), F.col("shingles").alias("sh_i"))
    so = sets.select(F.col("id").alias("doc_outer"), F.col("shingles").alias("sh_o"))
    # explode(array(struct(...))) barrier: the threshold filter references
    # generator output, so it cannot push into the join condition and
    # re-evaluate array_intersect there (see _jaccard_verify)
    verified = (
        cand.join(si, "doc_inner")
        .join(so, "doc_outer")
        .select(
            "doc_inner",
            "doc_outer",
            F.explode(
                F.array(
                    F.struct(
                        F.size("sh_i").cast("long").alias("n_inner"),
                        F.size("sh_o").cast("long").alias("n_outer"),
                        F.size(F.array_intersect("sh_i", "sh_o"))
                        .cast("long")
                        .alias("n_shared"),
                    )
                )
            ).alias("v"),
        )
        .select(
            "doc_inner",
            "doc_outer",
            F.col("v.n_inner").alias("n_inner"),
            F.col("v.n_outer").alias("n_outer"),
            F.col("v.n_shared").alias("n_shared"),
        )
        .withColumn(
            "containment_ppm", F.expr("n_shared * 1000000 DIV n_inner")
        )
    )
    return verified.filter(
        (F.col("containment_ppm") >= threshold_ppm)
        & (
            (F.col("n_inner") < F.col("n_outer"))
            | (
                (F.col("n_inner") == F.col("n_outer"))
                & (F.col("doc_inner") < F.col("doc_outer"))
            )
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash + LSH banding (spark.ml).

    Shingles -> sparse term vector (HashingTF) -> MinHashLSH
    ``approxSimilarityJoin``. Candidates collide only within band buckets,
    so complexity is ~linear in corpus size for bounded bucket sizes.
    Returns (doc_a, doc_b, jaccard_distance) with doc_a < doc_b.
    Deterministic for a fixed seed.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = docs.select(
        F.col(id_col).alias("id"), word_ngrams(F.col(text_col), n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(shingled)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, max_jaccard_distance, distCol="jaccard_distance")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("doc_a"),
            F.col("datasetB.id").alias("doc_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
    )


def shingle_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark-decontamination primitive: for every corpus document,
    count the DISTINCT word-n-gram shingles it shares with any document of
    the evaluation set. Training corpora are scrubbed of documents that
    overlap eval benchmarks; n-gram collision against the eval set's
    shingle index is the standard detector.

    Mechanics: both sides explode to (id, shingle-hash) rows; the eval
    side is collapsed to its DISTINCT shingle vocabulary; contamination is
    one inner equi-join on the 64-bit shingle hash + one grouped count.
    At 100 TB the eval vocabulary is tiny relative to the corpus (benchmark
    suites are MBs, corpora are TBs), so Spark broadcasts it and the whole
    check is a map-side join — the corpus never shuffles.

    Returns (id_col, n_shared_shingles) for CONTAMINATED docs only
    (n_shared_shingles >= 1); clean docs are absent (anti-join the result
    to drop flagged docs).
    """
    c_sh = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(word_ngrams(F.col(text_col), n), lambda s: F.xxhash64(s))
        ).alias("sh"),
    )
    e_sh = (
        eval_docs.select(
            F.explode(
                F.transform(word_ngrams(F.col(text_col), n), lambda s: F.xxhash64(s))
            ).alias("sh")
        )
        .dropDuplicates()
    )
    # bounded: |e_sh| = distinct shingles of the EVAL set, which is small
    # by construction (benchmarks are MBs, corpora are TBs); an eval set
    # approaching executor memory needs a shuffled join instead
    return (
        c_sh.join(F.broadcast(e_sh), "sh")
        .groupBy("id")
        .agg(F.count_distinct("sh").alias("n_shared_shingles"))
        .select(F.col("id").alias(id_col), "n_shared_shingles")
    )


def _portable_shingle_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    n_hashes: int,
    band_rows: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared md5-portable MinHash machinery: returns ``(sets, sig,
    bands)`` where ``sets`` is the persisted (id, shingles) relation
    (reused by the exact-Jaccard verify), ``sig`` is the per-doc MinHash
    signature (id, m0..m{n_hashes-1}), and ``bands`` is (id, band, bkey)
    — one row per document per LSH band."""
    n_bands = n_hashes // band_rows
    # filter ABOVE the persist boundary: pushed below it, the full
    # shingling expression is evaluated twice per row while materializing
    # the cache (see _shingle_prefix_index)
    cached = _spread_small_input(docs).select(
        F.col(id_col).alias("id"),
        word_ngrams(F.col(text_col), n).alias("shingles"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # reused by the signature pass and both verify sides
    sets = cached.filter(F.size("shingles") > 0)
    sh = sets.select("id", F.explode("shingles").alias("s"))

    def mh(i: int):
        return F.min(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("s"))), 1, 15), 16, 10
            ).cast("long")
        ).alias(f"m{i}")

    sig = sh.groupBy("id").agg(*[mh(i) for i in range(n_hashes)])
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"m{j * band_rows + r}") for r in range(band_rows)]
            ).alias("bkey"),
        )
        for j in range(n_bands)
    ]
    bands = sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bv")
    ).select("id", F.col("bv.band").alias("band"), F.col("bv.bkey").alias("bkey"))
    return sets, sig, bands


def incremental_minhash_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 8,
    band_rows: int = 2,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Incremental near-dup mining: candidates are NEW-batch docs x
    EXISTING-corpus docs only — the corpus is never compared against
    itself. This is the steady-state shape of a production dedup pipeline:
    the corpus side's signatures are computed once (in production, read
    back from the signature store this stage would maintain) and each
    arriving batch joins its own few band rows against them.

    Cost scales with |batch| x bands + the band-join fan-out, NOT with
    |corpus|^2 — re-running ``minhash_banded_pairs`` over corpus+batch
    would redo (and re-emit) all corpus-internal pairs every ingest cycle.
    Same md5-portable hash family as ``minhash_banded_pairs``, so the
    emitted (new_doc, old_doc, jaccard) set is exactly reproducible in
    ANSI SQL.
    """
    sets_c, _sig_c, bands_c = _portable_shingle_bands(
        corpus, id_col, text_col, n, n_hashes, band_rows
    )
    sets_b, _sig_b, bands_b = _portable_shingle_bands(
        batch, id_col, text_col, n, n_hashes, band_rows
    )
    cand = (
        bands_b.select(F.col("id").alias("new_doc"), "band", "bkey")
        .join(
            bands_c.select(F.col("id").alias("old_doc"), "band", "bkey"),
            ["band", "bkey"],
        )
        .select("new_doc", "old_doc")
        .dropDuplicates()
    )
    sa = sets_b.select(F.col("id").alias("new_doc"), F.col("shingles").alias("sh_a"))
    sb = sets_c.select(F.col("id").alias("old_doc"), F.col("shingles").alias("sh_b"))
    return _jaccard_verify(
        cand, sa, sb, "new_doc", "old_doc", threshold, round_digits
    )


def minhash_banded_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 8,
    band_rows: int = 2,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """MinHash + LSH banding built ONLY from engine-portable primitives
    (md5, substring, base-16 parse) so the emitted pair set is bit-exactly
    reproducible in ANSI SQL — unlike ``minhash_lsh_pairs`` (spark.ml),
    whose seeded hash family and HashingTF bucketing are JVM-specific and
    therefore grade rows-only.

    Scheme: the i-th MinHash of a document is min over its word-n-gram
    shingles of the 60-bit integer parsed from the first 15 hex digits of
    ``md5(i || ':' || shingle)`` (md5 is identical everywhere; 15 hex
    digits stay inside a signed 64-bit int in every engine). Signatures
    are cut into ``n_hashes / band_rows`` bands; two documents become a
    candidate pair iff some band matches exactly (probability
    1-(1-J^r)^b — recall < 1 BY DESIGN, that is the LSH contract);
    candidates are then verified with the EXACT n-gram Jaccard and
    filtered at ``threshold``.

    Scale: one shingle explode, ``n_hashes`` md5s per shingle (map-side,
    no extra shuffle), one grouped min, one equi-join on (band, key).
    The md5 family is ~3x slower per hash than xxhash64 — the price of
    cross-engine determinism; use the spark.ml variant when oracle
    reproducibility is not required.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sets, _sig, bands = _portable_shingle_bands(
        docs, id_col, text_col, n, n_hashes, band_rows
    )
    a = bands.select(F.col("id").alias("doc_a"), "band", "bkey")
    b = bands.select(F.col("id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sa = sets.select(F.col("id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sets.select(F.col("id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return _jaccard_verify(
        cand, sa, sb, "doc_a", "doc_b", threshold, round_digits
    )


def minhash_estimate_vs_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 8,
    band_rows: int = 2,
) -> DataFrame:
    """Estimator calibration for the banded MinHash: for every banded
    CANDIDATE pair, the MinHash Jaccard estimate (matching signature
    components / n_hashes) next to the exact shingle Jaccard, both in
    integer ppm, plus the absolute error — the measurement an operator
    reads to decide whether n_hashes is adequate before trusting the
    estimate at 100 TB (E[est] = J; sd = sqrt(J(1-J)/n_hashes), so 8
    hashes is a coarse estimator BY DESIGN — this op is what shows it).

    Cost: identical candidate generation to ``minhash_banded_pairs`` plus
    one signature self-join on the candidate pairs (signature relation is
    docs x n_hashes longs — narrow) and the same exact-verify join.

    Returns (doc_a, doc_b, est_ppm, exact_ppm, abs_err_ppm), doc_a < doc_b.
    """
    sets, sig, bands = _portable_shingle_bands(
        docs, id_col, text_col, n, n_hashes, band_rows
    )
    a = bands.select(F.col("id").alias("doc_a"), "band", "bkey")
    b = bands.select(F.col("id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    sig_a = sig.select(
        F.col("id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(n_hashes)],
    )
    sig_b = sig.select(
        F.col("id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(n_hashes)],
    )
    est = cand.join(sig_a, "doc_a").join(sig_b, "doc_b").select(
        "doc_a",
        "doc_b",
        F.expr(
            "CAST(("
            + " + ".join(
                f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END"
                for i in range(n_hashes)
            )
            + f") * 1000000 DIV {n_hashes} AS BIGINT)"
        ).alias("est_ppm"),
    )
    sa = sets.select(F.col("id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sets.select(F.col("id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        est.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .select(
            "doc_a",
            "doc_b",
            "est_ppm",
            F.expr(
                "CAST(n_inter * 1000000 DIV "
                "(size(sh_a) + size(sh_b) - n_inter) AS BIGINT)"
            ).alias("exact_ppm"),
        )
        .withColumn("abs_err_ppm", F.abs(F.col("est_ppm") - F.col("exact_ppm")))
        .orderBy("doc_a", "doc_b")
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document, entirely with JVM-side expressions.

    Each whitespace token is hashed with xxhash64; for every bit position the
    tokens vote +1/-1; the sign of each vote becomes the fingerprint bit.
    Implemented as explode -> 64 conditional sums -> bit assembly. No Python
    UDF: stays inside whole-stage codegen, aggregates map-side first.
    """
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    h = tok.withColumn("h", F.xxhash64("t"))
    votes = h.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select(F.col("id").alias(id_col), sim.alias("simhash"))


def simhash_portable_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 48,
    band_bits: int = 12,
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs from engine-portable primitives (md5 token
    hashes, explicit bit votes), so the banded candidate set AND the final
    Hamming distances are reproducible in ANSI SQL (dedup_simhash's DuckDB
    oracle) — the portable twin of ``simhash_near_pairs`` (xxhash64, the
    faster JVM-only path).

    48 bits (not 64) keeps every band value and the assembled fingerprint
    comfortably inside a SIGNED 64-bit integer in both engines (bit 63
    would flip the sign in Spark and overflow DuckDB's left shift).
    Banding: ``n_bits / band_bits`` bands; pigeonhole guarantees any pair
    with Hamming < n_bands shares a band; larger distances up to
    ``max_hamming`` are found when a band happens to match.

    Scale: explode tokens -> map-side 48 conditional sums (one grouped
    agg) -> 4 equi-joins on (band, value) -> popcount verify. No cross
    product, no Python.
    """
    n_bands = n_bits // band_bits
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    h = tok.withColumn(
        "h", F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
    )
    votes = h.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(n_bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(n_bits):
        sim = sim + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    sims = votes.select(F.col("id"), sim.alias("simhash"))
    mask = (1 << band_bits) - 1
    bands = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), band_bits * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(F.col("id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "val")
    b = bands.select(F.col("id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "val")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming.

    Banding: split the 64-bit fingerprint into 4 x 16-bit bands; by
    pigeonhole, any pair within Hamming distance 3 shares at least one exact
    band (larger distances are found when any band happens to match).
    Candidate generation is 4 equi-joins on (band_idx, band_value) — no cross
    product — followed by an exact popcount filter.
    """
    sims = simhash64(docs, id_col, text_col)
    bands = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "val")
    b = bands.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "val")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_to: int = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with a.id < b.id
    and cosine(a, b) >= threshold, cosine rounded to ``round_to``.

    Exact all-pairs scoring as a **blocked GEMM**: the corpus is tiled into
    ``n_blocks`` hash blocks, each unordered block pair (i <= j) becomes one
    group, and the group's full cosine tile is a single BLAS matmul inside
    ``applyInPandas``. Per-pair expression evaluation (zip_with/aggregate
    higher-order functions) is interpreted per element — measured ~10x
    slower than this form at 2k x 64 dims — and a pandas matmul also beats
    a per-row pandas UDF because Arrow moves each vector B+1 times instead
    of N times.

    Scale: compute is O(N²·d) by problem definition, but it parallelizes as
    B(B+1)/2 independent tiles whose memory is (2N/B)·d doubles — pick
    ``n_blocks`` so a tile fits an executor. At corpus scale the candidate
    set should still be pruned first (LSH/IVF as in ``minhash_lsh_pairs`` /
    ``ivf_topk``) with this exact scorer applied within buckets.
    """
    import numpy as np
    import pandas as pd

    # Output id type follows the input id type (int/long/string ids all
    # work) instead of a hardcoded long — the applyInPandas schema is the
    # Arrow contract, and a mismatch would fail or silently coerce.
    id_type = emb.schema[id_col].dataType.simpleString()
    out_schema = f"vec_a {id_type}, vec_b {id_type}, cosine double"

    B = n_blocks
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(B))).cast("int").alias("blk"),
    )
    # A vector in block k joins tile (k, j) for j >= k as side 'a' and tile
    # (i, k) for i <= k as side 'b' — each unordered pair lands in exactly
    # one tile, so no post-dedup is needed. Both side assignments are
    # emitted by ONE Generate over the concatenated struct sequences (a
    # union of two per-side selects would scan the embedding source twice
    # per render — same rows through the exchange, double the scan bytes).
    sides = F.concat(
        F.transform(
            F.sequence(F.col("blk"), F.lit(B - 1)),
            lambda j: F.struct(
                F.lit("a").alias("side"),
                F.col("blk").alias("gi"),
                j.alias("gj"),
            ),
        ),
        F.transform(
            F.sequence(F.lit(0), F.col("blk")),
            lambda i: F.struct(
                F.lit("b").alias("side"),
                i.alias("gi"),
                F.col("blk").alias("gj"),
            ),
        ),
    )
    tiles = e.select("id", "v", F.explode(sides).alias("t")).select(
        "id", "v", "t.side", "t.gi", "t.gj"
    )

    # No parameter annotations: a PARTIALLY hinted (key, pdf) signature
    # makes Spark 4 attempt (and fail) eval-type inference with a
    # TYPE_HINT_SHOULD_BE_SPECIFIED warning; unhinted signatures use the
    # applyInPandas schema argument alone.
    def score_tile(key, pdf):
        gi, gj = key
        av = pdf[pdf["side"] == "a"]
        bv = pdf[pdf["side"] == "b"]
        if av.empty or bv.empty:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype=pdf["id"].dtype),
                    "vec_b": pd.Series(dtype=pdf["id"].dtype),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        A = np.stack(av["v"].to_numpy())
        Bm = np.stack(bv["v"].to_numpy())
        # Zero vectors have no direction: a 0-norm row would divide to NaN
        # and silently fail every >= threshold comparison; exclude is the
        # documented semantics (a zero vector is near-dup to nothing).
        A_n = np.linalg.norm(A, axis=1, keepdims=True)
        B_n = np.linalg.norm(Bm, axis=1, keepdims=True)
        A = np.divide(A, A_n, out=np.zeros_like(A), where=A_n != 0)
        Bm = np.divide(Bm, B_n, out=np.zeros_like(Bm), where=B_n != 0)
        C = A @ Bm.T
        ia, ib = np.nonzero(np.round(C, round_to) >= threshold)
        ids_a = av["id"].to_numpy()[ia]
        ids_b = bv["id"].to_numpy()[ib]
        cos = C[ia, ib]
        if gi == gj:  # same-block tile contains both orderings; keep a < b
            keep = ids_a < ids_b
        else:  # cross-block pair appears once; orient ids
            keep = np.ones(len(ids_a), dtype=bool)
        lo = np.minimum(ids_a[keep], ids_b[keep])
        hi = np.maximum(ids_a[keep], ids_b[keep])
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "cosine": np.round(cos[keep], round_to)}
        )

    return tiles.groupBy("gi", "gj").applyInPandas(score_tile, out_schema)


def ivf_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    centroid_mod: int = 100,
    n_probe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-bucketed near-duplicate pair mining — the SCALE path that
    replaces the all-pairs scorer (``embedding_near_pairs``) inside dedup
    composites.

    Every vector is assigned to its ``n_probe`` nearest centroids
    (centroids picked deterministically: rows with id % centroid_mod == 0;
    nearest by cosine rounded to ``round_digits``, ties broken by centroid
    id). Candidate pairs are vectors sharing at least one assigned
    centroid — an EQUI-join on the centroid id, so the corpus is never
    cross-joined against itself — then each candidate is verified with the
    exact rounded cosine >= threshold.

    Recall < 1 by design (a near pair split across disjoint probe sets is
    missed), but the whole procedure is DETERMINISTIC and expressible in
    ANSI SQL, so composites built on it keep a full value-level DuckDB
    oracle. At 100 TB: one broadcast pass for assignment (k centroids
    broadcast), one shuffle on centroid id, per-bucket pair enumeration
    bounded by bucket size — O(sum b_i²·d), never O(N²·d).

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b.
    """
    dv = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    # Norms precomputed per SIDE (same sqrt(dot(v,v)) expression on the
    # same row — bit-identical doubles), so the corpus x centroids fanout
    # and the per-pair verify each evaluate ONE O(dim) aggregate instead
    # of three (guide §2.3).
    e = emb.select(F.col(id_col).alias("id"), dv(vec_col).alias("v")).withColumn(
        "__n", F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    cent = ivf_centroids(e, "id", "v", centroid_mod).withColumn(
        "__cn", F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    ccos = _dot(F.col("v"), F.col("cv")) / (F.col("__n") * F.col("__cn"))
    w_assign = Window.partitionBy("id").orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("__ccos", F.round(ccos, round_digits))
        .withColumn("__r", F.row_number().over(w_assign))
        .filter(F.col("__r") <= n_probe)
        .select("cid", "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # consumed by BOTH sides of the candidate self-join — without the
    #    persist the corpus x broadcast(centroids) assignment pass runs twice.
    #    NARROW (cid, id) only: the self-join sides read nothing else, and
    #    the verify re-attaches vectors from the raw scan — caching v/__n
    #    here materialized O(dim) doubles per n_probe-duplicated row that
    #    no consumer ever read (ADVICE r14)
    # Candidate pairs travel NARROW (ids only) through the bucket self-join
    # and the dedup exchange; the O(dim) vectors are re-attached afterwards
    # from the per-id slice of the cached assignment (guide §2.3: shuffle
    # keys, not payloads — the wide form shuffled both vectors per
    # candidate through the dropDuplicates exchange).
    a = assigned.select(F.col("id").alias("vec_a"), "cid")
    b = assigned.select(F.col("id").alias("vec_b"), "cid")
    cand = (
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates()
    )
    # vectors re-attach from the raw scan projection (one row per id — no
    # dedup pass needed), NOT from the cached assignment: routing through
    # the cache would render its corpus x broadcast(centroids) subtree
    # under two more consumers and re-read the n_probe-duplicated relation
    # for data the scan provides directly
    sa = e.select(
        F.col("id").alias("vec_a"), F.col("v").alias("va"), F.col("__n").alias("na")
    )
    sb = e.select(
        F.col("id").alias("vec_b"), F.col("v").alias("vb"), F.col("__n").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    # explode(array(...)) barrier: the threshold filter references the
    # generated column, so it cannot push into the attach-join condition
    # and re-evaluate the O(dim) dot there (see _jaccard_verify)
    scored = (
        cand.join(sa, "vec_a")
        .join(sb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.explode(F.array(F.round(cos, round_digits))).alias("cosine"),
        )
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", "cosine"
    )


def _srp_signs(n_planes: int, dim: int) -> list[list[int]]:
    """±1 hyperplane matrix derived from md5("{p}:{d}") parity — a fixed,
    public, engine-independent pseudo-random source. Computed driver-side
    with hashlib (same md5 as SQL engines) and embedded as literals, so no
    per-row hashing happens at execution time."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) & 1 else -1
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    band_bits: int = 4,
    quant: int = 1_000_000,
    round_digits: int = 6,
) -> DataFrame:
    """Signed-random-projection (random-hyperplane) LSH top-k — the
    DETERMINISTIC derandomization of the classic cosine-LSH: hyperplanes
    come from md5 parity (``_srp_signs``) instead of a seeded RNG, and
    each projection is an INTEGER dot product of the quantized vector
    (round(x*1e6), bit-identical IEEE ops in every engine) with the ±1
    plane — so signature bits, band buckets, and therefore the emitted
    candidate set reproduce exactly in ANSI SQL (sim_ann_lsh's oracle).

    Banding: ``n_planes/band_bits`` bands (default 4 bands x 4 planes —
    the synthetic corpus is near-orthogonal, so short bands are needed for
    useful recall; longer bands suit clustered real embeddings); query and
    corpus vectors collide when any band matches. Candidates are rescored with the exact
    rounded cosine and ranked top-k. Recall < 1 by design — vectors whose
    every band differs are never scored (the LSH contract; the seeded
    spark.ml variant ``brp_ann_topk`` has the same property with
    non-reproducible buckets).

    Scale: signatures are one map-side projection per vector (integer
    arithmetic over embedded literal planes — no hashing at run time, no
    shuffle); candidate generation is an equi-join on (band, value);
    per-candidate rescoring touches only colliding pairs.
    """
    signs = _srp_signs(n_planes, dim)
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    def with_sig(df: DataFrame) -> DataFrame:
        qi = F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * quant).cast("long"),
        )
        out = df.select(F.col(id_col).alias("id"), F.col(vec_col), qi.alias("__qi"))
        sig = F.lit(0).cast("long")
        for p in range(n_planes):
            # F.lit(list) per plane — cosmetic spelling; constant-folds
            # to the same Literal as an explicit CreateArray would
            # (see clustering._assign)
            plane = F.lit(list(signs[p])).cast("array<int>")
            proj = F.aggregate(
                F.zip_with(F.col("__qi"), plane, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            sig = sig + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        bands = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("__sig"), band_bits * i)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for i in range(n_bands)
            ]
        )
        return (
            out.withColumn("__sig", sig)
            .select("id", vec_col, F.explode(bands).alias("bv"))
            .select(
                "id", vec_col, F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
            )
        )

    dv = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    # per-side norm precompute: one O(dim) aggregate per candidate instead
    # of three, bit-identical cosines (see cosine_topk)
    qb = with_sig(queries).select(
        F.col("id").alias("query_id"), F.col(vec_col).alias("__qv"), "band", "val"
    ).withColumn("__qn", F.sqrt(_dot(dv("__qv"), dv("__qv"))))
    cb = with_sig(corpus).select(
        F.col("id").alias("neighbor_id"), F.col(vec_col).alias("__cv"), "band", "val"
    ).withColumn("__cn", F.sqrt(_dot(dv("__cv"), dv("__cv"))))
    cand = (
        qb.join(cb, ["band", "val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", "__qn", "__cv", "__cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(dv("__qv"), dv("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cos, round_digits).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_ann_oracle_sql(
    table: str = "embeddings",
    query_pred: str = "qb.vec_id < 10",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    band_bits: int = 4,
    quant: int = 1_000_000,
) -> str:
    """Generated DuckDB replica of :func:`srp_ann_topk` (the ±1 planes are
    embedded as list literals from the same md5 parity)."""
    signs = _srp_signs(n_planes, dim)
    rows = ", ".join(f"({p}, {signs[p]})" for p in range(n_planes))
    mask = (1 << band_bits) - 1
    bands = "\n      UNION ALL ".join(
        f"SELECT vec_id, {i} AS band, (sg >> {band_bits * i}) & {mask} AS val FROM sig"
        for i in range(n_planes // band_bits)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ), qi AS (
      SELECT vec_id, list_transform(v, x -> CAST(round(x * {quant}) AS BIGINT)) AS q
      FROM e
    ), planes AS (
      SELECT * FROM (VALUES {rows}) AS t(p, sgn)
    ), proj AS (
      SELECT vec_id, p,
             list_sum(list_transform(range(1, {dim} + 1), d -> q[d] * sgn[d])) AS pr
      FROM qi CROSS JOIN planes
    ), sig AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN pr >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS sg
      FROM proj GROUP BY vec_id
    ), bands AS (
      {bands}
    ), nrm AS (
      SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nm FROM e
    ), cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM bands qb JOIN bands cb ON qb.band = cb.band AND qb.val = cb.val
      WHERE {query_pred} AND qb.vec_id <> cb.vec_id
    ), scored AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(a.v, b.v) / (a.nm * b.nm), 6) AS cosine
      FROM cand c JOIN nrm a ON a.vec_id = c.query_id
                  JOIN nrm b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


def brp_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
    dist_threshold: float = 4.0,
) -> DataFrame:
    """spark.ml BucketedRandomProjectionLSH top-k (Euclidean) — the seeded
    JVM implementation of the same ANN idea. Buckets depend on the JVM RNG
    stream, so results are reproducible for a fixed seed within Spark but
    NOT replicable by an external SQL oracle; recall is bounded against
    the exact baseline in tests instead. ``srp_ann_topk`` is the
    derandomized, oracle-checkable variant."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    q = queries.select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(q, feats, dist_threshold, distCol="dist")
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") != F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("query_id"),
            F.col(f"datasetB.{id_col}").alias("neighbor_id"),
            F.round("dist", 4).alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 100,
) -> DataFrame:
    """THE centroid-selection invariant of the IVF family, defined once:
    corpus rows with ``id % centroid_mod == 0``, as (cid, cv) with the
    vector cast to double. ``ivf_near_pairs``, ``ivf_assignments`` and
    ``ivf_topk`` (query probing) all draw centroids from here so the
    index-build rule and the query-probe rule can never drift apart
    (ADVICE r4 — two inline copies could be edited independently).

    A real system would k-means these; the deterministic pick keeps the
    whole IVF path ANSI-SQL-reproducible for the DuckDB oracles."""
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return corpus.filter(F.col(id_col) % centroid_mod == 0).select(
        F.col(id_col).alias("cid"), dv.alias("cv")
    )


def ivf_assignments(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 100,
    round_digits: int = 6,
    carry_cols: tuple = (),
) -> DataFrame:
    """Build the inverted file: assign every corpus vector to its nearest
    deterministic centroid (corpus rows with ``id % centroid_mod == 0``).

    Returns (cid, neighbor_id, nv[, *carry_cols]) where ``nv`` is the
    double-cast vector (``carry_cols`` rides metadata such as a tenant /
    label column through the inverted file so a FILTERED search can
    equi-join on it — ``ivf_filtered_topk``)
    — the shared assignment step of ``ivf_topk`` (probed search) and the
    index-health profile (``sim_ivf_index_stats``): a tuning run inspects
    bucket balance on exactly the relation the search will probe.

    Assignment ranking uses ROUNDED cosines (+ cid tie-break): unrounded
    ranking is FP-summation-order-sensitive, which would make bucket
    membership engine-specific; rounding makes the whole inverted file
    reproducible in ANSI SQL (sim_ann_ivf's DuckDB oracle).

    Scale: centroids are k rows broadcast everywhere; assignment is one
    narrow pass over the corpus plus a per-vector window over k candidate
    rows — no corpus shuffle beyond the (vector, centroid) fanout, which
    is bounded by k per vector.
    """
    dv = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    # centroid norm once per centroid, vector norm once per corpus row —
    # the k-way fanout then evaluates ONE O(dim) aggregate per (vector,
    # centroid) instead of three; sqrt(dot(v, v)) is the same expression
    # on the same row, so every ranked cosine is bit-identical
    cent = ivf_centroids(corpus, id_col, vec_col, centroid_mod).withColumn(
        "__cn", F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    cos_to_cent = _dot(F.col("nv"), F.col("cv")) / (
        F.col("__nn") * F.col("__cn")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        dv(vec_col).alias("nv"),
        *[F.col(x) for x in carry_cols],
    ).withColumn("__nn", F.sqrt(_dot(F.col("nv"), F.col("nv"))))
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    return (
        c.crossJoin(F.broadcast(cent))
        .withColumn("__ccos", F.round(cos_to_cent, round_digits))
        .withColumn("__r", F.row_number().over(w_assign))
        .filter(F.col("__r") == 1)
        .select("cid", "neighbor_id", "nv", "__nn", *carry_cols)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 100,
    n_probe: int = 2,
    round_digits: int = 6,
    label_col: str | None = None,
) -> DataFrame:
    """IVF-style approximate top-k cosine neighbors.

    The scale path for similarity search when both sides are large (the
    brute-force ``cosine_topk`` is corpus x queries):

    1. pick centroids deterministically (corpus rows with id % mod == 0 —
       a real system would k-means; determinism matters more here);
    2. assign every corpus vector to its nearest centroid — one broadcast
       pass, yielding an equi-join key (the inverted file);
    3. each query probes its ``n_probe`` nearest centroids' buckets only,
       so scoring is an *equi-join* on centroid id + per-bucket top-k,
       never a full cross product. Recall < 1 by design (tested with a
       recall bound vs the exact baseline, not a hash oracle).

    ``label_col`` composes the vector-DB PRE-filter into the same body
    (ONE source for the probe tie-break and ranking contracts — the
    drift ADVICE r4 factored ivf_centroids/ivf_assignments to prevent):
    the label rides the inverted file (``carry_cols``), candidate
    generation becomes the (cid, label) equi-join, and the filter prunes
    each probed bucket BEFORE any O(dim) dot product. Filtered recall is
    < 1 twice over — the probe misses buckets AND a selective filter can
    empty every probed bucket — the reason engines raise n_probe under
    filters.

    Returns (query_id, neighbor_id[, label], cosine, rank).
    """
    dv = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    # probe-side norms precomputed per query row (__qn), centroid norms
    # per centroid (__cn): the probe fanout and the bucket scoring each
    # evaluate one O(dim) aggregate per pair instead of three —
    # bit-identical cosines (same sqrt(dot) expression, same rows)
    cent = ivf_centroids(corpus, id_col, vec_col, centroid_mod).withColumn(
        "__cn", F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    cos_to_cent = lambda v, vn: _dot(v, F.col("cv")) / (  # noqa: E731
        vn * F.col("__cn")
    )
    # The label rides the join under an INTERNAL alias (the __qlabel/
    # __nlabel convention _label_pair_topk uses): a caller's label column
    # named cid/qv/nv/query_id/neighbor_id must not collide with the
    # internal columns and corrupt the equi-join (ADVICE r13). Re-aliased
    # back to the caller's name on output.
    lab = ["__ivf_label"] if label_col else []

    assigned = ivf_assignments(
        corpus.withColumnRenamed(label_col, "__ivf_label")
        if label_col
        else corpus,
        id_col=id_col,
        vec_col=vec_col,
        centroid_mod=centroid_mod,
        round_digits=round_digits,
        carry_cols=tuple(lab),
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        *([F.col(label_col).alias("__ivf_label")] if label_col else []),
        dv(vec_col).alias("qv"),
    ).withColumn("__qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__ccos").desc(), F.col("cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "__ccos",
            F.round(cos_to_cent(F.col("qv"), F.col("__qn")), round_digits),
        )
        .withColumn("__r", F.row_number().over(w_probe))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", *lab, "qv", "__qn", "cid")
    )

    cos = _dot(F.col("qv"), F.col("nv")) / (F.col("__qn") * F.col("__nn"))
    scored = (
        probes.join(assigned, ["cid", *lab])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            *lab,
            F.round(cos, round_digits).alias("cosine"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    out_lab = [F.col("__ivf_label").alias(label_col)] if label_col else []
    return (
        scored.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", *out_lab, "cosine", "rank")
    )



def _label_pair_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    label_col: str,
    round_digits: int,
    same_label: bool,
    cast_labels: bool,
) -> DataFrame:
    """The label-predicated brute-force scoring core shared by
    ``filtered_cosine_topk`` (same-label: the vector-DB pre-filter's
    exact baseline) and ``hard_negative_topk`` (different-label:
    contrastive hard-negative mining) — ONE body for the certified
    deterministic shape (broadcast query block x one corpus scan, the
    label predicate applied BEFORE the O(dim) dot product, double dots,
    rounded cosine, (cosine desc, neighbor_id) tie-break), so the two
    complements cannot drift apart. Returns
    (query_id, __qlabel, neighbor_id, __nlabel, cosine, rank)."""
    lab = (lambda c: F.col(c).cast("int")) if cast_labels else F.col
    # per-side norm precompute: one O(dim) aggregate per pair instead of
    # three, bit-identical cosines (see cosine_topk)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        lab(label_col).alias("__qlabel"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qv"),
    ).withColumn("__qn", F.sqrt(_dot(F.col("__qv"), F.col("__qv"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        lab(label_col).alias("__nlabel"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__cv"),
    ).withColumn("__cn", F.sqrt(_dot(F.col("__cv"), F.col("__cv"))))
    label_pred = (
        (F.col("__nlabel") == F.col("__qlabel"))
        if same_label
        else (F.col("__nlabel") != F.col("__qlabel"))
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        (F.col("neighbor_id") != F.col("query_id")) & label_pred
    )
    cos = _dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = pairs.select(
        "query_id",
        "__qlabel",
        "neighbor_id",
        "__nlabel",
        F.round(cos, round_digits).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def filtered_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Exact PRE-filtered top-k: for each query vector, the k nearest
    corpus vectors carrying the query's OWN label (search my collection /
    tenant / language) — ``hard_negative_topk``'s complement (same-label
    instead of different-label, one shared core: _label_pair_topk) and
    the exact ground truth the filtered IVF tier
    (``ivf_topk(label_col=...)``) measures its recall against. The label
    predicate applies BEFORE scoring, so non-matching rows never pay the
    O(dim) dot product. Returns (query_id, neighbor_id, label, cosine,
    rank)."""
    return _label_pair_topk(
        corpus,
        queries,
        k,
        id_col,
        vec_col,
        label_col,
        round_digits,
        same_label=True,
        cast_labels=False,
    ).select(
        "query_id",
        "neighbor_id",
        F.col("__nlabel").alias(label_col),
        "cosine",
        "rank",
    )


def ivf_filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_mod: int = 100,
    n_probe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """FILTERED vector search at the IVF tier — ``ivf_topk`` with the
    label pre-filter composed in (one shared body; see its docstring
    for the posture). Kept as a named entry point so the filtered tier
    reads as a first-class member of the family.

    Returns (query_id, neighbor_id, label, cosine, rank).
    """
    return ivf_topk(
        corpus,
        queries,
        k,
        id_col=id_col,
        vec_col=vec_col,
        centroid_mod=centroid_mod,
        n_probe=n_probe,
        round_digits=round_digits,
        label_col=label_col,
    )



def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the k nearest corpus vectors with a DIFFERENT label — the
    negatives closest to the decision boundary, which dominate the
    contrastive gradient (cf. Robinson et al., "Contrastive Learning with
    Hard Negative Samples", ICLR 2021). ``filtered_cosine_topk``'s
    complement over the shared label-predicated core (_label_pair_topk):
    broadcast query block x one corpus scan, JVM-side dot products, the
    label-mismatch predicate applied BEFORE scoring so same-label rows
    never pay the O(dim) dot product, ranking on the ROUNDED cosine with
    an id tie-break so both engines rank identically.

    Scale posture (100 TB): exact brute force is the per-batch baseline —
    queries broadcast (bounded by contract), corpus scanned once, no
    shuffle. When the query block itself is corpus-sized, swap the scan
    for the IVF route (``ivf_topk``): bucket both sides by nearest
    centroid and score only within probed buckets — the label predicate
    composes unchanged (``label_col=``).
    """
    return _label_pair_topk(
        corpus,
        queries,
        k,
        id_col,
        vec_col,
        label_col,
        round_digits,
        same_label=False,
        cast_labels=True,
    ).select(
        "query_id",
        F.col("__qlabel").alias("query_label"),
        "neighbor_id",
        F.col("__nlabel").alias("neighbor_label"),
        "cosine",
        "rank",
    )
