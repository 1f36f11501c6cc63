"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) —
the pure-Python connector surface for systems with no JVM driver
(internal REST services, bespoke binary stores, simulators).

``SyntheticDocsDataSource`` ("synthdocs") is a deterministic document
generator used to certify the API mechanics end to end:

- **Partition planning**: the row range splits into ``partitions`` input
  partitions, so a 1000-executor cluster reads in parallel — generation
  happens executor-side; the driver only plans ranges.
- **Filter pushdown** (``pushFilters``, 4.1 API): range predicates on
  ``doc_id`` narrow the planned row range BEFORE partitions are created,
  so a ``doc_id < k`` query plans only the overlapping partitions — the
  Python-source analog of parquet row-group pruning. All filters are also
  returned as remaining, letting Spark re-apply them (double-filtering is
  semantically free; missing rows would not be).
- **Determinism**: row content is a pure function of ``doc_id`` (md5
  tokens), so reads are reproducible across retries — task retry safety
  is a correctness requirement for any custom source at scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_LANGS = ("en", "es", "de", "fr", "zh")
_SCHEMA = "doc_id bigint, lang string, text string"


def _doc_text(doc_id: int, n_tokens: int = 8) -> str:
    toks = []
    for i in range(n_tokens):
        h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
        toks.append(h[:6])
    return " ".join(toks)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.lo = 0  # inclusive doc_id lower bound after pushdown
        self.hi = self.n_rows  # exclusive upper bound after pushdown

    def pushFilters(self, filters):
        for f in filters:
            col = f.attribute if isinstance(f.attribute, str) else f.attribute[0]
            v = getattr(f, "value", None)
            if col != "doc_id" or not isinstance(v, int):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, v)
                self.hi = min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, v + 1)
            # handled-for-pruning filters are STILL returned: Spark
            # re-applies them, which keeps the source trivially correct
            yield f

    def partitions(self):
        # fixed-width partitions over the FULL domain, then PRUNE the ones
        # outside the pushed-down [lo, hi) — mirroring how a file source
        # prunes whole row groups: the partition layout is a property of
        # the data, the predicate just deselects (and clips) ranges
        per = -(-self.n_rows // self.n_parts)  # ceil division
        parts = []
        for s in range(0, self.n_rows, per):
            e = min(s + per, self.n_rows)
            cs, ce = max(s, self.lo), min(e, self.hi)
            if cs < ce:
                parts.append(_RangePartition(cs, ce))
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, _LANGS[doc_id % len(_LANGS)], _doc_text(doc_id))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _SynthDocsReader:
        return _SynthDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
