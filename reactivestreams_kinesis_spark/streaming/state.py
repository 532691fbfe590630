"""Arbitrary stateful streaming operator (T7): applyInPandasWithState.

The reference's only state machine is the subscription itself (demand
counter + FIFO queue + remaining-elements, ``ShardSubscription.java:36-45``);
this module exposes the general-purpose replacement: user-defined state
per key, managed by Spark with checkpointed fault tolerance.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
_STATE_SCHEMA = "n bigint, total double, mx double"


def _running_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum, max) across microbatches — the
    canonical demand-free stateful fold. State survives batches (and
    restarts, via the checkpoint) — exactly what the reference's in-memory
    queue cannot do (``ShardSubscription.java:215-216``)."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Apply the stateful fold per user over a streaming events DataFrame.
    Update output mode: each batch emits the refreshed state rows for keys
    seen in that batch."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _running_stats,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
    """The same per-user running fold on the ``transformWithStateInPandas``
    API (Spark 4.x successor to applyInPandasWithState): state lives in
    named, typed handles (ValueState here; ListState/MapState and timers
    are available) managed by the RocksDB state store — the operator to
    reach for on new pipelines, since it adds state TTL, timers, and
    schema evolution over the legacy GroupState flavor.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (set per-query by callers/tests; the
    default HDFS-backed store does not support this operator) AND the
    ``protobuf`` package (Spark's TWS state-server protocol) — absent
    from this container, so the operator raises a clear ImportError up
    front instead of crashing the streaming Python worker mid-query;
    the accompanying test skips accordingly and the legacy
    ``running_user_stats`` flavor remains the container-proven T7 path.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark[connect] extra); use running_user_stats "
            "(applyInPandasWithState) where it is unavailable"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            if self._stats.exists():
                n, total, mx = self._stats.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._stats.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


GAPFILL_OUTPUT_SCHEMA = (
    "user_id bigint, day date, observed boolean, "
    "filled_value double, batch_seq bigint"
)
_GAPFILL_STATE = "days array<int>, cents array<bigint>, seq bigint"


def _gapfill_locf(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key streaming GAP FILL + LOCF (the stateful twin of the batch
    ``ts_gapfill_locf``): state is the key's observed-day ledger —
    (epoch day → exact cent total) as parallel arrays — merged with each
    batch's arrivals and re-emitted as the key's DENSE span grid with
    last-observation-carried-forward fills, stamped with a per-key batch
    sequence so consumers can keep the newest grid (update output mode).

    Out-of-order arrivals are the design case: a late day lands in the
    ledger wherever it belongs, and the next emission regrows the grid
    around it — convergence to the batch result needs no ordering
    assumption at all. Values accumulate as integer cents (the exact
    dual of the batch path's DECIMAL(12,2) sums), so replay order cannot
    perturb a double accumulation; the final ``cents / 100.0`` is the
    same correctly-rounded double as the batch's decimal→double cast.

    Scale shape: state per key is its OBSERVED days only (not the dense
    span); each emission is span-proportional and only for keys touched
    by the batch. A production deployment bounds the ledger with state
    TTL / window eviction — out of scope for the parity harness."""
    import datetime as dt

    import numpy as np

    if state.exists:
        days, cents, seq = state.get
        book = dict(zip(days, cents))
    else:
        book, seq = {}, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        sums = pdf.groupby("day")["cents"].sum()
        for d, c in sums.items():
            book[int(d)] = book.get(int(d), 0) + int(c)
    seq += 1
    state.update((list(book.keys()), list(book.values()), seq))
    if not book:
        return
    lo, hi = min(book), max(book)
    span = np.arange(lo, hi + 1)
    observed = np.isin(span, np.fromiter(book.keys(), dtype=np.int64))
    filled: list[float] = []
    last = 0.0
    for d in span:
        if int(d) in book:
            last = book[int(d)] / 100.0
        filled.append(last)
    epoch = dt.date(1970, 1, 1)
    yield pd.DataFrame(
        {
            "user_id": key[0],
            "day": [epoch + dt.timedelta(days=int(d)) for d in span],
            "observed": observed,
            "filled_value": filled,
            "batch_seq": seq,
        }
    )


def streaming_gapfill_locf(keyed_days: DataFrame) -> DataFrame:
    """Apply the stateful gap-fill fold per user over a streaming
    DataFrame of ``(user_id bigint, day int epoch-days, cents bigint)``
    rows. Update output mode: each batch re-emits the refreshed dense
    grid for the keys it touched; the NEWEST ``batch_seq`` per key is
    the converged answer (the span only grows, so the latest emission
    contains every day)."""
    return keyed_days.groupBy("user_id").applyInPandasWithState(
        _gapfill_locf,
        outputStructType=GAPFILL_OUTPUT_SCHEMA,
        stateStructType=_GAPFILL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
