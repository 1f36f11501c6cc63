"""Deterministic sampling & dataset splitting for training-data pipelines.

``df.sample()`` is seed-dependent on partitioning and engine-specific, so it
can never be oracle-checked and — worse for a 100 TB pipeline — re-running
after adding files changes which rows are kept. These operators instead hash
a stable key (md5 of the key rendered as a string) and compare a fixed-width
hex prefix against a threshold:

- the decision depends only on the key value → reproducible across runs,
  partitionings, engines, and cluster sizes;
- it is a pure projection+filter → pushes into the scan, no shuffle, no
  driver coordination, trivially parallel at any scale;
- fixed-width lowercase hex compares lexicographically exactly as it does
  numerically, so the same literal threshold works in Spark and in ANSI
  SQL oracles (DuckDB ``substr(md5(..), 1, 4)``).

A 4-hex-digit prefix gives 65,536 buckets — rate granularity of ~0.0015%,
plenty for sampling rates used in practice; widen the prefix if not.

Replaces/extends nothing in the reference (it has no sampling); mandated by
the driver's LLM-data-pipeline surface (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: number of leading hex digits of the md5 used as the sampling bucket
PREFIX_DIGITS = 4
_BUCKETS = 16**PREFIX_DIGITS  # 65536


def hash_bucket(key: str | Column) -> Column:
    """Stable hex bucket for a row key: first 4 hex digits of md5(key).

    The key is rendered via CAST(key AS STRING) so integer keys hash
    identically in any engine (both Spark and DuckDB render bigints in
    plain decimal).
    """
    c = key if isinstance(key, Column) else F.col(key)
    return F.substring(F.md5(c.cast("string")), 1, PREFIX_DIGITS)


def threshold_hex(fraction: float) -> str:
    """Hex literal such that ``hash_bucket(k) < threshold`` keeps exactly
    floor(fraction * 65536) / 65536 of the bucket space.

    fraction >= 1.0 returns ``"g"`` — lexicographically greater than every
    4-hex-digit bucket ('g' > 'f'), so the filter keeps ALL rows. A clamp
    to 'ffff' here would silently drop the top bucket (~1/65536 of rows)
    for a caller asking for the full dataset.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * _BUCKETS)
    if n >= _BUCKETS:
        return "g"
    return format(n, f"0{PREFIX_DIGITS}x")


def deterministic_sample(df: DataFrame, key: str | Column, fraction: float) -> DataFrame:
    """Keep a deterministic ~``fraction`` Bernoulli sample keyed on ``key``."""
    return df.filter(hash_bucket(key) < threshold_hex(fraction))


def split_label(
    key: str | Column, weights: dict[str, float] | None = None
) -> Column:
    """Label each row 'train' / 'valid' / 'test' (or custom labels) by hash
    bucket. ``weights`` maps label -> fraction and must sum to <= 1; any
    remainder goes to the last label. Default 80/10/10.

    Being hash-based, the assignment is stable under re-runs and data
    growth: a document keeps its split forever — the property that prevents
    train/test contamination when a 100 TB corpus is incrementally rebuilt.
    """
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    labels = list(weights)
    bucket = hash_bucket(key)
    expr = None
    cum = 0.0
    for label in labels[:-1]:
        cum += weights[label]
        branch = bucket < F.lit(threshold_hex(cum))
        expr = F.when(branch, label) if expr is None else expr.when(branch, label)
    return F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])


def stratified_thresholds(stratum: str | Column, rates: dict[str, float], default: float) -> Column:
    """Per-stratum sampling threshold: CASE over the stratum column mapping
    each stratum to its own hex threshold (e.g. downsample 'en' to 1%,
    keep low-resource languages at 50%).
    """
    c = stratum if isinstance(stratum, Column) else F.col(stratum)
    expr = None
    for value, rate in rates.items():
        branch = c == value
        lit = F.lit(threshold_hex(rate))
        expr = F.when(branch, lit) if expr is None else expr.when(branch, lit)
    default_lit = F.lit(threshold_hex(default))
    return default_lit if expr is None else expr.otherwise(default_lit)


def stratified_sample(
    df: DataFrame, key: str | Column, stratum: str | Column, rates: dict[str, float], default: float
) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep rates, hash-keyed."""
    return df.filter(hash_bucket(key) < stratified_thresholds(stratum, rates, default))


def hash_bucket_int(key: str | Column) -> Column:
    """The md5 bucket as an integer in [0, 65536) — for thresholds computed
    FROM DATA at runtime (no hex literal to format). ``conv`` of the same
    4-hex prefix ``hash_bucket`` compares, so the two forms agree bucket
    for bucket; DuckDB replicates it as
    ``CAST(concat('0x', substr(md5(k), 1, 4)) AS BIGINT)``."""
    c = key if isinstance(key, Column) else F.col(key)
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, PREFIX_DIGITS), 16, 10
    ).cast("long")


def rebalance_to_targets(
    df: DataFrame,
    key: str | Column,
    stratum: str,
    weight: Column,
    targets: dict[str, int] | None = None,
) -> DataFrame:
    """Corpus mixture rebalancing: deterministically downsample each
    stratum (source / language / domain) so the surviving corpus matches
    target relative weights, keeping the LARGEST corpus that needs no
    upsampling.

    ``targets`` maps stratum value -> relative integer weight (unlisted
    strata get weight 1; ``None`` = uniform). With per-stratum weight
    totals ``c_s`` and target ratios ``r_s``, the binding stratum sets the
    scale ``K = min_s(c_s // r_s)`` and each stratum keeps
    ``(K * r_s) / c_s`` of its rows — all INTEGER arithmetic, so the
    per-stratum bucket thresholds (and therefore every kept row) are
    bit-identical in any engine, making the operator fully oracle-checkable.

    Scale posture (100 TB): pass 1 is a map-side-combinable agg to one row
    per stratum; the threshold table (strata count rows) broadcasts back,
    and pass 2 is a scan-side filter — the corpus is never shuffled.
    Hash-keyed selection means the kept set is stable under re-runs and
    incremental corpus growth (only the binding minimum moving changes it).
    """
    kc = key if isinstance(key, Column) else F.col(key)
    ratio = F.lit(1)
    for value, r in (targets or {}).items():
        ratio = F.when(F.col(stratum) == value, F.lit(int(r))).otherwise(ratio)
    base = df.withColumn("__w", weight.cast("long"))
    counts = base.groupBy(stratum).agg(
        F.sum("__w").alias("__c"), F.first(ratio).alias("__r")
    )
    # The binding scale K = min(c/r) is a window over the per-stratum count
    # table — strata-count rows, so the single-partition window is O(strata),
    # and the corpus is scanned exactly twice (counts + filter), never three
    # times as an agg+crossJoin formulation would plan it.
    thr = counts.select(
        stratum,
        F.expr(
            "CAST((min(__c DIV __r) OVER () * __r * 65536) DIV __c AS BIGINT)"
        ).alias("__thr"),
    )
    # Null-safe equality on the stratum: a plain inner join would silently
    # DROP every NULL-stratum row (they form a legitimate stratum of their
    # own — groupBy already counts them). Rows with a NULL key still drop
    # (md5(NULL) is NULL): sampling needs a stable non-null key by contract.
    thr2 = thr.withColumnRenamed(stratum, "__stratum")
    return (
        base.join(
            F.broadcast(thr2), F.col(stratum).eqNullSafe(F.col("__stratum"))
        )
        .filter(hash_bucket_int(kc) < F.col("__thr"))
        .drop("__w", "__thr", "__stratum")
    )


def es_key(key: str | Column, weight: str | Column) -> Column:
    """Efraimidis–Spirakis weighted-sampling key ``u^(1/w)``.

    ``u`` is the deterministic md5 bucket mapped to the open unit interval
    (``(h + 0.5) / 65536`` — never exactly 0 or 1, so ``pow``/``ln`` are
    always finite) and ``w`` is the row weight (> 0 by contract). Taking the
    k LARGEST keys draws a weighted sample without replacement: P(row i
    first) = w_i / sum(w) (Efraimidis & Spirakis, IPL 2006, "Weighted
    random sampling with a reservoir"). Deterministic u makes the draw
    reproducible across runs/engines — the same property the rest of this
    module builds on — at the price of one fixed sample per key-universe
    (re-keying, e.g. salting the md5 input, redraws).
    """
    kc = key if isinstance(key, Column) else F.col(key)
    wc = weight if isinstance(weight, Column) else F.col(weight)
    u = (hash_bucket_int(kc) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    return F.pow(u, F.lit(1.0) / wc.cast("double"))


def weighted_reservoir_topk(
    df: DataFrame, key: str | Column, weight: str | Column, k: int, round_digits: int = 6
) -> DataFrame:
    """Distributed weighted sample WITHOUT replacement of size k (A-ES).

    Appends ``es_key`` (rounded, so the ranking key is identical across
    engines) and ``rank`` and keeps the top k by (es_key desc, key asc).

    Scale posture (100 TB): the es-key is a scan-side projection; the
    top-k is an ``ORDER BY ... LIMIT k`` which Spark plans as
    TakeOrderedAndProject — each partition keeps its local k and only
    k-row heaps travel to the driver-side merge. No global sort, no
    shuffle of the corpus; the only data movement is num_partitions × k
    rows. (This is why the operator takes k, not a fraction: a fixed-size
    weighted draw is the reservoir formulation.)
    """
    kc = key if isinstance(key, Column) else F.col(key)
    keyed = df.withColumn("es_key", F.round(es_key(kc, weight), round_digits))
    ordered = keyed.orderBy(F.col("es_key").desc(), kc.asc()).limit(k)
    # The rank window runs over the already-limited k rows (k is small by
    # contract), so the unpartitioned window is O(k), not O(corpus).
    w = Window.orderBy(F.col("es_key").desc(), kc.asc())
    return ordered.withColumn("rank", F.row_number().over(w).cast("int"))


def shard_id(key: str | Column, n_shards: int) -> Column:
    """Deterministic shard assignment: md5 bucket mod n_shards.

    The md5 bucket (not Spark's murmur ``hash()``) keeps the assignment
    engine-portable and oracle-checkable; mod over a uniform 16-bit bucket
    is near-uniform for n_shards << 65536 (the exact per-shard expectation
    is audited by the shard_balance_audit query).
    """
    kc = key if isinstance(key, Column) else F.col(key)
    return (hash_bucket_int(kc) % F.lit(int(n_shards))).cast("int")


#: Poisson(1) inverse-CDF thresholds on the 16-bit md5 bucket:
#: floor(65536 * CDF(k)) for k = 0..6 (P(X > 6) < 1e-4 truncates to 7).
#: Hard-coded INTEGER constants so the Spark ladder, the SQL oracle
#: rendering, and any replica recompute from the same numbers.
POISSON1_THRESHOLDS = [24109, 48218, 60273, 64291, 65296, 65497, 65530]


def poisson1_multiplicity(key: str | Column) -> Column:
    """Deterministic Poisson(1) draw for ``key``: the bootstrap-resample
    multiplicity of a row in one replicate (the Poisson bootstrap —
    Chamandy et al., "Estimating uncertainty for massive data streams",
    Google TR 2012 — the streaming/distributed form of the bootstrap:
    independent per-row multiplicities, no global resample pass).

    Inverse CDF over the md5 bucket with the integer thresholds in
    :data:`POISSON1_THRESHOLDS`, so the draw is bit-identical in any
    engine. Key the draw on ``doc_id || ':' || replicate`` to get
    independent replicates.
    """
    h = hash_bucket_int(key)
    expr = None
    for mult, t in enumerate(POISSON1_THRESHOLDS):
        cond = h < F.lit(t)
        branch = F.lit(mult)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(F.lit(len(POISSON1_THRESHOLDS))).cast("long")


def poisson1_sql(key_expr: str) -> str:
    """DuckDB rendering of :func:`poisson1_multiplicity` over the SQL
    expression ``key_expr`` — generated from the same threshold constants
    so the two cannot drift."""
    h = (
        f"CAST(concat('0x', substr(md5({key_expr}), 1, 4)) AS BIGINT)"
    )
    whens = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(POISSON1_THRESHOLDS)
    )
    return f"CAST(CASE {whens} ELSE {len(POISSON1_THRESHOLDS)} END AS BIGINT)"


def hash_rank_int(key: str | Column, salt: str = "") -> Column:
    """A fine-grained deterministic rank: the first 15 hex digits of the
    md5 as a 60-bit non-negative integer — for exact order-statistic
    selection where the 16-bit ``hash_bucket_int`` grid is too coarse to
    break per-row ties. DuckDB replicates it as
    ``CAST(concat('0x', substr(md5(salt || k), 1, 15)) AS BIGINT)``."""
    c = key if isinstance(key, Column) else F.col(key)
    if salt:
        c = F.concat(F.lit(salt), c.cast("string"))
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
