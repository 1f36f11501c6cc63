"""The Python UDF surface (SURVEY.md §2.5 "UDF surface").

The reference's only UDF is a row-at-a-time lambda for epoch→timestamp
(``/root/reference/etl_pipeline.py:170``) — an optimization barrier the
engine replaces with ``timestamp_millis`` (SURVEY.md §2.4-D3). The forms
here exist to prove the plumbing for logic that genuinely can't be a
builtin; each is Arrow-batched (never row-at-a-time), and each has an
all-builtin twin used as its correctness oracle:

- ``charged_price_pandas``   — vectorized scalar ``pandas_udf``: whole
  columns arrive as ``pd.Series`` per Arrow batch.
- ``weighted_avg_pandas``    — grouped-aggregate ``pandas_udf``: Series in,
  scalar out, usable inside ``groupBy().agg``.
- ``zscore_per_group``       — grouped-map ``applyInPandas``: whole group as
  a ``pd.DataFrame``; the group must fit one executor's memory, so key
  cardinality/skew is the scale limit (salt or pre-aggregate first).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

# Return types are DataType instances, not DDL strings: string return types
# are parsed through the active SparkContext, which would make this module
# unimportable before a session exists.


@pandas_udf(DoubleType())
def charged_price_pandas(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    """TPC-H charged price, vectorized: ext * (1 - disc) * (1 + tax)."""
    return ext * (1.0 - disc) * (1.0 + tax)


@pandas_udf(DoubleType())
def weighted_avg_pandas(value: pd.Series, weight: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg UDF: sum(v*w)/sum(w) over one group's Arrow batches."""
    return float((value * weight).sum() / weight.sum())


def token_count_arrow(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token counts via ``mapInArrow`` — the zero-copy end of the
    UDF spectrum: Arrow RecordBatches in, Arrow RecordBatches out, computed
    entirely with pyarrow.compute kernels (no pandas materialization). Use
    this form when the logic is expressible in Arrow kernels but not in
    Spark builtins; here it exists as the API-surface twin of the all-builtin
    ``functions.text.token_count_ws``. Empty/whitespace-only strings count 0
    here vs 1 for a regex-split builtin — both engines in the oracle pair see
    the same non-empty corpus, and the distinction is documented, not hidden.
    """

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            toks = pc.list_value_length(
                pc.utf8_split_whitespace(pc.utf8_trim_whitespace(b.column(1)))
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pc.cast(toks, pa.int32())], [id_col, "n_tokens"]
            )

    return df.select(id_col, text_col).mapInArrow(fn, f"{id_col} long, n_tokens int")


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group z-score via grouped-map applyInPandas (ddof=1, matching
    stddev_samp); groups with stddev 0/NULL yield NULL z."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf[value].std(ddof=1)
        mean = pdf[value].mean()
        pdf = pdf.copy()
        pdf["z"] = (pdf[value] - mean) / sd if sd and sd > 0 else pd.NA
        return pdf

    # A fresh StructType, NOT df.schema.add(...): add() mutates the cached
    # schema object in place, so the input df would appear to grow a column.
    schema = StructType(list(df.schema.fields) + [StructField("z", DoubleType())])
    return df.groupBy(key).applyInPandas(norm, schema=schema)
