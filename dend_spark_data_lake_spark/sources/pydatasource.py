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

``JsonlShardsDataSource`` ("jsonlshards") is the WRITER-side counterpart:
a partition-parallel JSONL training-shard sink exercising Spark 4's
``DataSourceWriter`` commit protocol (staged task files -> driver-side
atomic publication with a ``_SUCCESS`` manifest; see the class docstring
for the retry-safety argument).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
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


class _SynthDocsStreamReader(DataSourceStreamReader):
    """STREAMING counterpart of the batch reader (Spark 4
    ``DataSourceStreamReader`` — the partition-planning variant, not
    ``SimpleDataSourceStreamReader``, so each microbatch still fans out
    across executors like the batch read does).

    Offset protocol (the exactly-once contract):

    - offsets are ``{"offset": n}`` dicts — n is the count of doc_ids
      fully delivered to COMMITTED microbatches; Spark persists them in
      the checkpoint's offset log, so a restarted query resumes at the
      last planned offset instead of replaying from zero.
    - ``latestOffset`` advances by at most ``rows_per_batch`` per
      microbatch (rate limiting — the backpressure a real source applies
      so one batch cannot swallow an unbounded backlog), saturating at
      the ``rows`` cap, at which point the query drains and
      ``processAllAvailable``/AvailableNow terminates.
    - ``partitions(start, end)`` splits the (start, end] doc_id range
      into ``partitions`` executor-side ranges; ``read`` regenerates
      content as a pure function of doc_id, so a retried task replays
      the IDENTICAL rows — determinism is what turns at-least-once task
      scheduling into exactly-once stream delivery.
    - ``commit(end)`` is a no-op: a generator has nothing to garbage-
      collect; a queue-backed source would acknowledge/trim here.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 100))
        self.n_parts = int(options.get("partitions", 4))
        self._current = 0  # rate-limit cursor
        # highest offset observed from ANY engine callback (partitions
        # start AND end, commit). latestOffset reports from max(cursor,
        # seen), so once any callback has carried a checkpointed position
        # the reported offset cannot regress below it — this covers the
        # partitions-first and commit-first restart orderings. The one
        # ordering it cannot cover: a clean restart whose FIRST callback
        # is latestOffset (last batch fully committed, so the engine has
        # nothing to replan) — no callback has carried the checkpoint yet,
        # so latestOffset reports per_batch. That is safe, not lossy: the
        # engine maxes the reported offset with its own offset log, and
        # partitions()/read() only ever see engine-validated (start, end]
        # ranges, so no row is skipped or re-delivered either way.
        self._seen = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._current = min(max(self._current, self._seen) + self.per_batch, self.n_rows)
        return {"offset": max(self._current, self._seen)}

    def partitions(self, start: dict, end: dict):
        s, e = start["offset"], end["offset"]
        # resuming from a checkpoint ahead of this (fresh) reader's
        # rate-limit cursor: fast-forward so latestOffset never regresses.
        # Fold BOTH bounds in — on a restart replaying the last planned
        # batch, the checkpointed position the engine knows about is the
        # start s (e is the batch being re-planned); on steady-state calls
        # e dominates anyway.
        self._seen = max(self._seen, s, e)
        self._current = max(self._current, s, e)
        per = max(1, -(-(e - s) // self.n_parts))
        return [
            _RangePartition(lo, min(lo + per, e)) for lo in range(s, e, per)
        ] or [_RangePartition(s, s)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, _LANGS[doc_id % len(_LANGS)], _doc_text(doc_id))

    def commit(self, end: dict) -> None:
        # nothing to acknowledge/trim for a deterministic generator, but
        # commit IS a checkpoint-position signal — fold it into _seen
        self._seen = max(self._seen, int(end["offset"]))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _SynthDocsReader:
        return _SynthDocsReader(self.options)

    def streamReader(self, schema) -> _SynthDocsStreamReader:
        return _SynthDocsStreamReader(self.options)


# ---------------------------------------------------------------------------
# Writer side: JSONL training-shard sink ("jsonlshards")
# ---------------------------------------------------------------------------


class _ShardCommit(WriterCommitMessage):
    """Per-task commit message: where the task staged its shard and how
    many rows it holds. Must be picklable (travels executor -> driver)."""

    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class _JsonlShardsWriter(DataSourceWriter):
    """Partition-parallel JSONL shard writer with a TWO-PHASE COMMIT:

    - ``write`` (executor-side, once per partition, possibly RETRIED):
      streams the partition's rows to a uniquely-named temp file under
      ``<path>/_staging/``. A retried/speculative task writes a DIFFERENT
      temp file — nothing is visible yet, so double-writes cannot corrupt
      the output (the task-retry-safety contract every distributed sink
      must satisfy).
    - ``commit`` (driver-side, exactly once, only after ALL tasks
      succeed): renames the winning temp files to ``shard-NNNNN.jsonl``
      and writes a ``_SUCCESS`` manifest with per-shard row counts —
      readers treat the manifest as the atomic publication point.
    - ``abort``: deletes staged files; a failed job leaves no partial
      output visible.

    Local-filesystem rename is used here; on object stores the same
    protocol runs against a manifest/marker layer (rename is not atomic
    on S3 — that swap is a deployment concern, not a protocol change).
    JSONL shards are the interchange format LLM training loaders consume,
    which is why this sink exists alongside parquet.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards: 'path' option is required")

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        tmp = os.path.join(staging, f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(tmp, n)

    def commit(self, messages):
        import json as _json
        import os
        import shutil

        manifest = []
        shard_no = 0
        for m in messages:
            if m is None or m.n_rows == 0:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)
                continue
            final = os.path.join(self.path, f"shard-{shard_no:05d}.jsonl")
            os.replace(m.tmp_path, final)
            manifest.append({"shard": os.path.basename(final), "rows": m.n_rows})
            shard_no += 1
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            _json.dump({"shards": manifest}, f)
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)


class JsonlShardsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlshards"

    def writer(self, schema, overwrite: bool) -> _JsonlShardsWriter:
        import glob as _glob
        import os

        if overwrite:
            path = self.options.get("path")
            if path:
                for f in _glob.glob(os.path.join(path, "shard-*.jsonl")):
                    os.remove(f)
                succ = os.path.join(path, "_SUCCESS")
                if os.path.exists(succ):
                    os.remove(succ)
        return _JsonlShardsWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(JsonlShardsDataSource)
