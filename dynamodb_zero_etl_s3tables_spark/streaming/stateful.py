"""Custom stateful streaming operator (SURVEY.md §2 H7 family):
per-key running aggregates via ``applyInPandasWithState``.

This is the escape hatch for stateful semantics Spark's built-in
windows can't express (running totals that must survive across
microbatches and emit an update per batch). State is a per-key
(count, total) pair managed by Spark's state store — partitioned by
key, checkpointed, and GC'd by the state timeout, so state size is
bounded by live-key cardinality, not stream length.

Batch twin (the oracle law, tested in tests/test_streaming_stateful):
draining a file backlog through this operator must produce the same
final per-key totals as a plain groupBy sum over the same files.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

#: output schema of the running-total operator
RUNNING_TOTAL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State update: fold this microbatch's rows for one key into the
    (count, total) state; emit the post-update running aggregate."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) across microbatches.
    Works on a streaming DataFrame grouped by user_id; each batch
    emits the updated totals for keys seen in that batch only."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas variant: the StatefulProcessor
# API replaces the bare (key, batches, state) callback with a handle
# exposing typed Value/List/Map state cells and event/processing-time
# timers — the successor API for custom stateful operators.
# Runtime note: this API serializes state-store traffic with
# google.protobuf; environments without protobuf can still import
# this module (the class definition is inert), but executing the
# stream needs the dependency (the test skips when it's absent).
# ---------------------------------------------------------------------------

#: output schema of the running-extremes processor
RUNNING_EXTREMES_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_EXTREMES_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


class RunningExtremesProcessor(StatefulProcessor):
    """Per-key running (count, max(value)) in a ValueState cell;
    emits the post-update extremes for each key seen in the batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("extremes", _EXTREMES_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, vmax = self._state.get()
        else:
            n, vmax = 0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            vmax = max(vmax, float(pdf["value"].max()))
        self._state.update((n, vmax))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [vmax]}
        )

    def close(self) -> None:
        pass


def has_protobuf() -> bool:
    """transformWithStateInPandas talks to the state store over a
    protobuf channel (pyspark.sql.streaming.proto imports
    google.protobuf at runtime); the rest of the engine never needs
    it. Probed here so callers fail actionably instead of deep inside
    a Spark worker."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        # find_spec raises (not returns None) when the PARENT package
        # 'google' itself is absent
        return False


def running_extremes(events: DataFrame) -> DataFrame:
    """Per-user running (count, max(value)) across microbatches via
    the Spark 4 transformWithStateInPandas API. Same state-store
    partitioning/checkpointing guarantees as running_totals; the
    typed-state handle is the forward-compatible surface (ListState /
    MapState / timers hang off the same handle).

    Requires ``protobuf`` (see :func:`has_protobuf`). Where it is
    absent, :func:`running_totals`'s applyInPandasWithState path
    covers the same running-aggregate law without the dependency."""
    if not has_protobuf():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(Spark's state-server channel is protobuf-encoded). Install "
            "protobuf, or use running_totals() — the "
            "applyInPandasWithState twin of this operator, which covers "
            "the same stateful-streaming law with no extra dependency."
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningExtremesProcessor(),
        outputStructType=RUNNING_EXTREMES_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
