from .text import (  # noqa: F401
    tokens,
    token_count_ws,
    token_count_bpe_ish,
    quality_columns,
    normalized_fingerprint,
    langid_heuristic,
)
from .similarity import (  # noqa: F401
    cosine_topk,
    word_ngrams,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash64,
    simhash_near_pairs,
)
