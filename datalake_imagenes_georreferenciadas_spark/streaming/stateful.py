"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 EXT — the arbitrary-state surface beyond built-in windows).

Built-in streaming aggregations cover windowed counts; anything with
bespoke per-key state (running distinct-ish counters, custom eviction,
model-ish accumulators) needs the GroupState API. The Spark shape:

    stream.groupBy(key).applyInPandasWithState(
        fn, outputSchema, stateSchema, "update", NoTimeout)

``fn`` receives Arrow-batched pandas frames per key per micro-batch plus
a GroupState handle that persists across batches in the state store —
crash-safe via the checkpoint, exactly the contract a hand-rolled
"accumulate in a driver dict" loop (the reference's posture) lacks.

At 100 TB the state is partitioned by key across executors and each
micro-batch touches only keys present in the batch; skewed keys shard
like any other groupBy (salt upstream if one key dominates).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "event_type string, n long, sum_value double"
_STATE_SCHEMA = "n long, sum_value double"


def running_totals(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, sum) maintained in GroupState.

    Emits ONE updated row per key per micro-batch — the accumulating
    twin of a ``groupBy(...).agg`` in complete mode, but with state the
    operator owns (extensible to custom eviction/decay that built-in
    aggs can't express). ``sum_value`` is rounded to 4 decimals at emit.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n": [n], "sum_value": [round(s, 4)]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        RUNNING_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
