"""Batch MERGE / upsert without a table format that supports it natively.

The reference (mahdi-hosseini/dend_spark_data_lake) overwrites whole
Parquet tables per run (etl_pipeline.py:113-118,242-247,287-289 — and with
default errorifexists mode, defect D4); a lake engine additionally needs
incremental maintenance: apply a batch of updates/inserts to an existing
snapshot. Delta/Iceberg expose this as ``MERGE INTO``; on plain Parquet
the equivalent is a single full-outer join producing the next snapshot,
which is what this module implements.

Scale notes: one shuffle on the merge keys (or zero if both sides are
bucketed on the keys by ``write_bucketed_table``); the output is the new
snapshot to write back with dynamic partition overwrite. Source-wins
semantics are decided per row with a presence marker, NOT per column with
``coalesce`` — coalesce would silently resurrect target values wherever
the source legitimately carries NULL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_MARK = "__is_source_row__"


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """SQL ``MERGE`` with WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED
    THEN INSERT * semantics: source rows replace key-matching target rows,
    unmatched source rows are appended, unmatched target rows pass through.

    ``source`` must have (at least) the target's columns; the result has
    exactly the target's schema.
    """
    t = target.alias("t")
    s = source.withColumn(_MARK, F.lit(1)).alias("s")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )
    matched = F.col(f"s.{_MARK}").isNotNull()
    return t.join(s, cond, "full_outer").select(
        *[
            F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in target.columns
        ]
    )
