"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.5 "stateful ops").

Unlike the built-in windowed aggregations (streaming/windows.py), these
own their per-key state explicitly: the state survives across microbatches
in the state store, partitioned by group key — so state scales out with
executors, and a key's state size (not the stream size) is the memory
bound. Timeouts are the eviction mechanism; without one, keys accumulate
forever (fine for bounded key domains like user ids, wrong for unbounded
ones like session ids — those need a TTL timeout).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(
    events: DataFrame, key: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running per-key event count + value sum, emitted each microbatch the
    key appears in (update semantics).

    The state tuple (n, total) is numeric-constant-size per key. Arrow
    moves each group's rows as pandas batches; state round-trips through
    the state store between microbatches.
    """

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    # derive the key field's type from the input schema — hardcoding
    # bigint would emit a wrong output schema for e.g. a string user id
    key_type = events.schema[key].dataType.simpleString()
    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=f"{key} {key_type}, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(
    events: DataFrame, key: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Running per-key totals on the ``transformWithStateInPandas`` API —
    Spark 4's arbitrary-state operator, the successor to
    ``applyInPandasWithState`` (same semantics as ``running_user_totals``
    above, so the stream==batch test covers both implementations).

    Differences that matter at scale: state is HANDLE-BASED (named
    ValueState/ListState/MapState registered in ``init``), each with an
    optional per-state TTL — eviction no longer needs hand-rolled timer
    logic for the simple expiry case; the state store still partitions by
    group key, so memory scales with keys-per-executor, not stream size.

    Runtime requirement: the TWS driver worker needs the Python
    ``protobuf`` package (absent in this container — the stream==batch
    test auto-skips; ``running_user_totals`` above is the fully-exercised
    equivalent).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key_tuple, rows, timer_values):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    # derive the key field's type from the input schema — hardcoding
    # bigint would emit a wrong output schema for e.g. a string user id
    key_type = events.schema[key].dataType.simpleString()
    return events.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=f"{key} {key_type}, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def sessionize_with_timeout(
    events: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 minute",
) -> DataFrame:
    """Custom sessionization with EVENT-TIME TIMEOUT eviction — the pattern
    the built-in ``session_window`` cannot express when you need custom
    per-session logic (here: emit (start, end, n) exactly once when the
    session's gap expires at the watermark).

    State per key is one open session (3 longs). A closed session is
    emitted either when a later in-batch event exceeds the gap, or — the
    part that needs the state machinery — when NO further event arrives
    and the event-time timer set at ``end + gap`` fires as the watermark
    passes it. Without the timer, an abandoned session would sit in the
    state store forever; this is the bounded-state contract at scale.
    """
    gap_ms = gap_minutes * 60_000

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_ms: int, end_ms: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield emit(start_ms, end_ms, n)
            return

        batch = pd.concat(list(pdfs))
        ts_ms = (
            batch[ts_col].astype("int64") // 1_000_000
        ).sort_values().tolist()  # ns -> ms
        cur = state.get if state.exists else None
        for t in ts_ms:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_ms:
                yield emit(*cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
        state.update(cur)
        # the timer IS the eviction: fires when watermark passes end + gap
        state.setTimeoutTimestamp(cur[1] + gap_ms)

    key_type = events.schema[key].dataType.simpleString()
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=(
                f"{key} {key_type}, session_start timestamp, "
                "session_end timestamp, n_events bigint"
            ),
            stateStructType="start_ms bigint, end_ms bigint, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
