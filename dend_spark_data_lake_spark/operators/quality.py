"""Declarative data-quality checks (Deequ-style, DataFrame-native).

A lake pipeline needs constraint validation BEFORE bad data lands in a
100-TB table: null checks, domain/range checks, key uniqueness, and
referential integrity. Each rule compiles to dataflow:

- row-level rules (not_null / in_range / in_set / matches) fuse into ONE
  conditional aggregate over a single scan — adding rules adds columns to
  the same pass, not passes;
- ``unique`` is one keyed aggregate (count per key, sum the excess);
- ``foreign_key`` is a left-anti join against the referenced keys (the
  dimension side is typically broadcastable).

The result is a tiny (rule, n_violations) relation — cheap to alert on,
assert on, or append to a quality history table.

Reference parity: the reference's only "validation" is dropna/filter
cleaning (``/root/reference/etl_pipeline.py:198-229``) — cleaning silently
drops; checking *counts* what would drop. Extension surface per
SURVEY.md §2.5 / BASELINE.json's pipeline posture.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class RowRule:
    """A row-level constraint: ``cond`` must hold for every row."""

    name: str
    cond: Column


@dataclass
class UniqueRule:
    name: str
    keys: list[str]


@dataclass
class ForeignKeyRule:
    name: str
    keys: list[str]
    ref: DataFrame
    ref_keys: list[str]
    broadcast_ref: bool = True


def not_null(*cols: str) -> RowRule:
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return RowRule(f"not_null({','.join(cols)})", cond)


def in_range(col: str, lo, hi) -> RowRule:
    return RowRule(f"in_range({col},{lo},{hi})", F.col(col).between(lo, hi))


def in_set(col: str, values: list) -> RowRule:
    return RowRule(f"in_set({col})", F.col(col).isin(values))


def matches(col: str, regex: str) -> RowRule:
    return RowRule(f"matches({col})", F.col(col).rlike(regex))


def check(df: DataFrame, rules: list) -> DataFrame:
    """Evaluate all rules; returns (rule, n_violations) with one scan for
    all row-level rules plus one small job per unique/FK rule."""
    results: list[DataFrame] = []

    row_rules = [r for r in rules if isinstance(r, RowRule)]
    if row_rules:
        agg = df.agg(
            *[
                F.sum(
                    F.when(~r.cond | r.cond.isNull(), 1).otherwise(0)
                ).alias(str(i))
                for i, r in enumerate(row_rules)
            ]
        )
        # unpivot the single row into (rule, n_violations)
        results.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(r.name).alias("rule"),
                                F.col(str(i)).cast("long").alias("n_violations"),
                            )
                            for i, r in enumerate(row_rules)
                        ]
                    )
                ).alias("s")
            ).select("s.rule", "s.n_violations")
        )

    for r in rules:
        if isinstance(r, UniqueRule):
            dup = (
                df.groupBy(*r.keys)
                .agg(F.count("*").alias("n"))
                .agg(
                    F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            results.append(dup)
        elif isinstance(r, ForeignKeyRule):
            ref = r.ref.select(
                *[F.col(rk).alias(k) for k, rk in zip(r.keys, r.ref_keys)]
            ).dropDuplicates()
            if r.broadcast_ref:
                ref = F.broadcast(ref)
            orphans = (
                df.join(ref, r.keys, "left_anti")
                .agg(F.count("*").cast("long").alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            results.append(orphans)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
