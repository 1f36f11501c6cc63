"""Greedy sequence packing: assign variable-length documents to fixed
token-budget packs (context windows) — the batch-construction step of LLM
training prep, where short documents are concatenated until the window is
full and the next document opens a new pack.

Greedy first-fit-in-order packing is an inherently SEQUENTIAL recurrence
(the pack a document lands in depends on the running remainder of every
document before it), which no SQL window can express. Instead of a Python
loop, the fold runs as ONE Catalyst ``aggregate`` higher-order-function
over a per-shard sorted array — executor-local, JVM-side, no UDF.

Scale posture (100 TB): the shard key is ``id // docs_per_shard``, so every
shard holds a FIXED number of documents regardless of corpus size — the
collected array is bounded (docs_per_shard structs of two longs), and the
shard count grows linearly with the data. One keyed shuffle (the groupBy),
one explode; nothing global. This mirrors how production packing runs: each
writer packs its own shard independently, and (shard, pack_id) is the
globally unique pack key. Packing quality is within a document-order
reshuffle of optimal for corpus-scale inputs (bin-packing is NP-hard; greedy
in-order is the standard streaming choice and wastes < 1 item per pack).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def greedy_pack(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    budget: int,
    docs_per_shard: int = 64,
    order_col: str | Column | None = None,
) -> DataFrame:
    """Assign each row to a ``(shard, pack_id)`` greedily in ``id_col``
    order: a row joins the current pack while the pack's running weight
    stays <= ``budget``, else it opens the next pack. A row heavier than
    the budget occupies a pack alone (and the row after it always starts
    fresh). Returns one row per input row:
    ``(id_col, shard, pack_id, weight)``.

    ``weight_col`` may be a column name or an expression (e.g. a token
    count computed from text).

    ``id_col`` must be a NON-NULL NUMERIC id: it defines both the shard
    (``id // docs_per_shard``) and the packing order. A string id would
    cast to NULL and silently vanish — hash it to a long first
    (``xxhash64``) if the corpus has no numeric key.

    ``order_col`` (optional, NON-NULL NUMERIC when given) packs each
    shard in ``(order_col, id_col)`` order instead of bare id order —
    the APPEND hook: give standing documents order 0 and an arriving
    batch order 1 and the batch fills the standing layout's tail
    capacity without disturbing it (left-fold prefix property: the
    standing prefix of the combined fold IS the standing-only fold).
    Omitted, behavior is byte-identical to the pre-append operator.
    """
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    o = (
        None
        if order_col is None
        else (order_col if isinstance(order_col, Column) else F.col(order_col))
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        w.cast("long").alias("w"),
        F.floor(F.col(id_col) / docs_per_shard).cast("long").alias("shard"),
        *([] if o is None else [o.cast("long").alias("o")]),
    )

    # Sorted (id, w) structs: array_sort orders by the leading field(s), so
    # the fold visits documents in (order,) id order within the shard.
    head = [] if o is None else [F.col("o")]
    arr = F.array_sort(
        F.collect_list(F.struct(*head, F.col("id"), F.col("w")))
    )

    # Fold state: (current pack, its running weight, assignments so far).
    # acc starts above the budget so the first element always opens pack 0,
    # including a zero-weight first element.
    init = F.struct(
        F.lit(-1).cast("long").alias("pack"),
        F.lit(budget + 1).cast("long").alias("acc"),
        F.expr(
            "CAST(array() AS array<struct<id:bigint,w:bigint,pack:bigint>>)"
        ).alias("out"),
    )

    def step(a: Column, x: Column) -> Column:
        fits = (a["acc"] + x["w"]) <= F.lit(budget)
        new_pack = F.when(fits, a["pack"]).otherwise(a["pack"] + 1)
        new_acc = F.when(fits, a["acc"] + x["w"]).otherwise(x["w"])
        entry = F.struct(
            x["id"].alias("id"), x["w"].alias("w"), new_pack.alias("pack")
        )
        return F.struct(
            new_pack.alias("pack"),
            new_acc.alias("acc"),
            F.concat(a["out"], F.array(entry)).alias("out"),
        )

    folded = F.aggregate(arr, init, step, lambda a: a["out"])

    return (
        base.groupBy("shard")
        .agg(folded.alias("assign"))
        .select("shard", F.explode("assign").alias("r"))
        .select(
            F.col("r.id").alias(id_col),
            F.col("shard").alias("shard"),
            F.col("r.pack").alias("pack_id"),
            F.col("r.w").alias("weight"),
        )
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill accounting over ``greedy_pack`` output: document count,
    token total, and fill ratio against the budget. One small keyed agg."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("weight").cast("long").alias("tokens_used"),
        F.round(F.sum("weight") / F.lit(budget), 6).alias("fill_ratio"),
    )


#: power-of-two padding bucket ladder (min 16, cap 8192 — documents longer
#: than the cap clip to it, modelling a max-sequence-length truncation).
POW2_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


def pow2_length_bucket(n_tokens: Column, buckets: list[int] | None = None) -> Column:
    """Smallest ladder bucket >= n_tokens (the padded sequence length when
    batching by length, as dynamic-padding data loaders do). Implemented as
    a CASE ladder — integer comparisons only, no ``log2`` float round-trip
    whose exactness at powers of two would differ per libm — so the bucket
    is bit-identical in any engine and the ladder folds into the scan
    projection. Values above the top bucket CLIP to it (truncation)."""
    ladder = buckets or POW2_BUCKETS
    expr = None
    for b in ladder[:-1]:
        cond = n_tokens <= F.lit(b)
        expr = F.when(cond, F.lit(b)) if expr is None else expr.when(cond, F.lit(b))
    top = F.lit(ladder[-1])
    return (expr.otherwise(top) if expr is not None else top).cast("long")


def pow2_bucket_sql(expr: str, buckets: list[int] | None = None) -> str:
    """The DuckDB oracle rendering of :func:`pow2_length_bucket` over the
    SQL expression ``expr`` — generated from the same ladder constant so
    the two can never drift."""
    ladder = buckets or POW2_BUCKETS
    whens = " ".join(f"WHEN {expr} <= {b} THEN {b}" for b in ladder[:-1])
    return f"CAST(CASE {whens} ELSE {ladder[-1]} END AS BIGINT)"


def bpe_train(
    vocab: DataFrame, merges: int = 3
) -> tuple[DataFrame | None, list[DataFrame]]:
    """Train ``merges`` BPE merge rules over a ``(w, f)`` word-frequency
    vocabulary (Sennrich et al. 2016): per iteration, count corpus-
    frequency-weighted adjacent symbol pairs, take the argmax pair
    (count desc, then lexicographic), and apply it to every word as ONE
    greedy left-to-right ``replace()``. Words ride as ``'<sym><sym>'``
    delimited strings — callers must restrict the vocabulary to
    ``^[a-z]+$`` so the delimiters cannot collide — and the replace
    semantics (non-overlapping, left-to-right) are identical in Spark,
    DuckDB, and Python, which IS the BPE application rule. The contract
    is ENFORCED in-plan (ADVICE r9): an out-of-contract word hits
    ``raise_error`` at execution time and fails the training job loudly
    instead of silently corrupting pair counts and merge tables. The
    guard is a per-row regexp over the bounded VOCABULARY (the callers'
    own ``rlike`` filter already evaluated it once), adds no job, and
    keeps every stage frame lazy.

    Returns ``(merge_table, stages)``: merge_table is the learned
    ``(merge_step, left_sym, right_sym, pair_n)`` frame (None when the
    vocabulary never yields an adjacent pair), stages is
    ``[v0, v1, ..]`` — the delimited vocabulary after 0, 1, .. merges —
    for payoff rollups.

    Scale posture: the iterative loop collects exactly ONE winning
    (pair, count) row per merge — the kmeans/PQ trajectory driver
    bound — and every iteration scans only the bounded VOCABULARY (pair
    explode + combinable count + TakeOrdered(1) argmax); the merge is a
    literal replace, no join. The corpus token stream is the CALLER's
    one scan that built ``vocab``.

    Reference parity: no tokenizer training exists in the reference
    (mahdi-hosseini/dend_spark_data_lake); driver-mandated extension
    surface (SURVEY.md §2.6, tokenization family).
    """
    guarded = F.when(
        F.col("w").rlike("^[a-z]+$"), F.col("w")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "bpe_train: vocabulary word violates the ^[a-z]+$"
                    " delimiter contract: "
                ),
                F.coalesce(F.col("w"), F.lit("<NULL>")),
            )
        )
    )
    v = vocab.select(F.regexp_replace(guarded, "(.)", "<$1>").alias("w"), "f")
    stages = [v]
    merge_table = None
    for step in range(1, merges + 1):
        pc = (
            v.select(
                F.split(
                    F.expr("substring(w, 2, length(w) - 2)"), "><"
                ).alias("s"),
                "f",
            )
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), i ->"
                        " struct(element_at(s, i) AS l,"
                        " element_at(s, i + 1) AS r))"
                    )
                ).alias("p"),
                "f",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("f").cast("long").alias("n"))
        )
        m = (
            pc.orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .select(
                F.lit(step).cast("int").alias("merge_step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("n").alias("pair_n"),
            )
        )
        rows = m.collect()
        if not rows:
            break
        merge_table = m if merge_table is None else merge_table.unionByName(m)
        l, r = rows[0].left_sym, rows[0].right_sym
        v = v.select(
            F.replace(
                F.col("w"), F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>")
            ).alias("w"),
            "f",
        )
        stages.append(v)
    return merge_table, stages
