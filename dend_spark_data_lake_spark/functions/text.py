"""Text-analysis functions for LLM-data pipelines.

All hot-path functions are pure Column expressions (JVM-side, codegen'd,
Arrow-free) — no Python UDFs — so they run at scan speed over 100 TB of
``documents``-shaped data. SURVEY.md §2.5 "Text analysis".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny English stopword set used by the heuristic scorers. Deliberately
# small and fixed so oracle SQL can replicate it verbatim.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

WS = r"\s+"
# "BPE-ish" token pattern: runs of letters, runs of digits, or single
# non-alphanumeric marks — approximates subword pre-tokenization.
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(col if isinstance(col, Column) else F.col(col))), WS)


def token_count_ws(col: str | Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(col if isinstance(col, Column) else F.col(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS)))


def token_count_bpe_ish(col: str | Column) -> Column:
    """Count of BPE-ish pre-tokens (letters runs / digit runs / marks)."""
    return F.regexp_count(col if isinstance(col, Column) else F.col(col), F.lit(BPE_ISH))


def stopword_hits(col: str | Column, stopwords=EN_STOPWORDS) -> Column:
    """Number of whitespace tokens that are stopwords."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def quality_columns(col: str | Column) -> dict[str, Column]:
    """Quality-scoring signals: char/token counts, avg token length,
    punctuation count, stopword hits. Combine/threshold downstream; kept as
    separate integer-exact columns so results are engine-reproducible.
    """
    c = col if isinstance(col, Column) else F.col(col)
    n_chars = F.length(c)
    n_tok = token_count_ws(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[.!?,;:]", ""))
    n_stop = stopword_hits(c)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
    }


def repetition_columns(col: str | Column) -> dict[str, Column]:
    """Repetition-quality signals (the Gopher-rules family): integer-exact
    counts of total/distinct tokens and bigrams plus the top token's
    frequency. Boilerplate, keyword-stuffed, and generator-degenerate text
    scores high on duplicate fractions; thresholding happens downstream.
    All pure array expressions — the token array is materialized once per
    row and every count derives from it JVM-side.
    """
    t = tokens(col)
    t = F.filter(t, lambda x: x != "")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # top token frequency via aggregate over the distinct set: for each
    # distinct token count its occurrences, take the max
    top = F.aggregate(
        F.array_distinct(t),
        F.lit(0),
        lambda acc, d: F.greatest(acc, F.size(F.filter(t, lambda x: x == d))),
    )
    return {
        "n_tokens": F.size(t),
        "n_distinct_tokens": F.size(F.array_distinct(t)),
        "top_token_count": top,
        "n_bigrams": F.size(bigrams),
        "n_distinct_bigrams": F.size(F.array_distinct(bigrams)),
    }


def sliding_chunks(
    col: str | Column, chunk_tokens: int = 32, stride: int = 24
) -> Column:
    """Overlapping token-window chunks — the context-window splitting step
    of RAG indexing / LLM training prep: windows of ``chunk_tokens``
    whitespace tokens starting every ``stride`` tokens (overlap =
    chunk_tokens - stride), with the final short window kept iff it starts
    inside the text. Returns an array of (chunk_idx, chunk_text, n_tokens)
    structs to ``posexplode`` downstream.

    Pure array expressions (one split per row, slice+join per window):
    chunking runs at scan speed and the 1→N expansion stays pipelined —
    no shuffle, no Python.
    """
    t = F.filter(tokens(col), lambda x: x != "")
    n = F.size(t)
    # Last start = smallest stride multiple + 1 whose window reaches the end
    # (ceil((n - chunk)/stride) in integer arithmetic), so every token is
    # covered and the tail window may be short; one window when n <= chunk.
    last_start = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride).cast("int") * stride + 1
    )
    starts = F.when(n > 0, F.sequence(F.lit(1), last_start, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice(t, s, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.size(t) - s + 1, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )


def normalize_text(col: str | Column) -> Column:
    """Canonical text normalization for dedup/fingerprinting: casefold,
    strip non-alphanumerics, collapse runs of whitespace to single spaces,
    trim. Pure regexp expressions — replicable verbatim in ANSI SQL.
    """
    c = col if isinstance(col, Column) else F.col(col)
    norm = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(norm, WS, " "))


def normalized_fingerprint(col: str | Column) -> Column:
    """Deterministic document fingerprint: md5 of :func:`normalize_text` —
    catches formatting-only duplicates that exact-text dedup misses.
    """
    return F.md5(normalize_text(col))


def langid_heuristic(col: str | Column, min_hit_rate_pct: int = 5) -> Column:
    """Heuristic language ID: 'en' when >= min_hit_rate_pct% of tokens are
    English stopwords, else 'unk'. The comparison is done in integer
    arithmetic (hits*100 >= ntok*pct) so the decision boundary is exact and
    engine-independent.
    """
    hits = stopword_hits(col)
    ntok = token_count_ws(col)
    return (
        F.when(ntok == 0, F.lit("unk"))
        .when(hits * 100 >= ntok * F.lit(min_hit_rate_pct), F.lit("en"))
        .otherwise(F.lit("unk"))
    )
