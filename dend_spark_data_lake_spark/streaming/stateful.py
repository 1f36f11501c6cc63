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

    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=f"{key} bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
