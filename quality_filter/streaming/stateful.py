"""Custom stateful streaming operator: per-key forward fill.

The reference's video loop keeps an incremental buffer + "current
aggregate" between frames (/root/reference/opennsfw2/_inference.py:177,
207-218) — a hand-rolled keyed state machine.  Structured Streaming's
``applyInPandasWithState`` is the declarative home for that state: one
(last_value,) tuple per key, carried across micro-batches by the state
store, evicted by timeout.

Ordering contract: stream_forward_fill sorts by (ts, tiebreak) INSIDE
each micro-batch; across micro-batches it assumes per-key arrival order
(exactly the reference's assumption for cv2 frame order).
stream_forward_fill_late drops that assumption: it buffers rows behind
an event-time watermark and emits them in event-time order, so
out-of-order arrival within the watermark delay matches the batch twin
exactly.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_forward_fill(
    sdf: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value: str,
    out: str = "filled",
    state_ttl_ms: int = 0,
) -> DataFrame:
    """Streaming per-key forward fill: every row inherits the most recent
    non-null ``value`` seen for its key (0.0 before the first), across
    micro-batch boundaries via the state store.

    Batch twin: quality_filter.operators.windows.forward_fill — the two
    are asserted equal in tests (same dual-surface discipline as the
    scoring UDFs).
    """
    out_schema = T.StructType(
        [
            sdf.schema[key],
            sdf.schema[ts],
            sdf.schema[tiebreak],
            T.StructField(out, T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last", T.DoubleType())])

    def fill(
        key_tuple: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values([ts, tiebreak])
            filled = []
            for v in pdf[value]:
                if pd.notna(v):
                    last = float(v)
                filled.append(last if last is not None else 0.0)
            yield pd.DataFrame(
                {
                    key: pdf[key].values,
                    ts: pdf[ts].values,
                    tiebreak: pdf[tiebreak].values,
                    out: filled,
                }
            )
        state.update((last,))
        if state_ttl_ms > 0:
            state.setTimeoutDuration(state_ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return sdf.groupBy(key).applyInPandasWithState(
        fill, out_schema, state_schema, "append", timeout
    )


def stream_forward_fill_late(
    sdf: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    value: str,
    out: str = "filled",
    delay: str = "10 minutes",
) -> DataFrame:
    """Late-data-tolerant per-key forward fill: rows BUFFER in the state
    store behind an event-time watermark and are emitted (in event-time
    order, fill applied over the ordered sequence) only once the
    watermark guarantees nothing earlier can still arrive.  Out-of-order
    arrival within ``delay`` therefore produces output identical to the
    batch twin — the in-order-arrival assumption of stream_forward_fill
    (the reference's cv2 frame-order assumption,
    /root/reference/opennsfw2/_inference.py:187-218) is discharged.

    Mechanics: per key the state holds (last_value, buffered rows).
    Each invocation merges new rows into the buffer, emits the sorted
    prefix with ts <= watermark, and re-arms an EventTimeTimeout at the
    earliest buffered row so the tail flushes on a no-data micro-batch
    when the watermark passes it.  A row arriving LATER than ``delay``
    (already behind the emitted horizon) is still emitted — immediately,
    filled with the current last-value — rather than dropped; row
    conservation over silent loss.

    ``tiebreak`` must be an integral column (it rides the state buffer
    as ARRAY<LONG>); ``value`` must be numeric."""
    sdf = sdf.withWatermark(ts, delay)
    out_schema = T.StructType(
        [
            sdf.schema[key],
            sdf.schema[ts],
            sdf.schema[tiebreak],
            T.StructField(out, T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last", T.DoubleType()),
            T.StructField("ts_buf", T.ArrayType(T.LongType())),   # epoch ns
            T.StructField("tb_buf", T.ArrayType(T.LongType())),
            T.StructField("val_buf", T.ArrayType(T.DoubleType())),
        ]
    )

    def fill(
        key_tuple: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last, ts_buf, tb_buf, val_buf = state.get
            ts_buf, tb_buf, val_buf = list(ts_buf), list(tb_buf), list(val_buf)
        else:
            last, ts_buf, tb_buf, val_buf = None, [], [], []
        for pdf in pdfs:
            if len(pdf):
                ts_buf.extend(int(x) for x in pdf[ts].astype("int64"))
                tb_buf.extend(int(x) for x in pdf[tiebreak].astype("int64"))
                val_buf.extend(
                    None if pd.isna(v) else float(v) for v in pdf[value]
                )
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        order = sorted(range(len(ts_buf)), key=lambda i: (ts_buf[i], tb_buf[i]))
        emit_idx = [i for i in order if ts_buf[i] <= wm_ns]
        keep_idx = [i for i in order if ts_buf[i] > wm_ns]
        if emit_idx:
            filled = []
            for i in emit_idx:
                v = val_buf[i]
                if v is not None:
                    last = v
                filled.append(last if last is not None else 0.0)
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(emit_idx),
                    ts: pd.to_datetime([ts_buf[i] for i in emit_idx], unit="ns"),
                    tiebreak: [tb_buf[i] for i in emit_idx],
                    out: filled,
                }
            )
        state.update(
            (
                last,
                [ts_buf[i] for i in keep_idx],
                [tb_buf[i] for i in keep_idx],
                [val_buf[i] for i in keep_idx],
            )
        )
        if keep_idx:
            # wake when the watermark passes the earliest buffered row
            # (guaranteed > current watermark, as every kept ts is)
            state.setTimeoutTimestamp(min(ts_buf[i] for i in keep_idx) // 1_000_000 + 1)

    return sdf.groupBy(key).applyInPandasWithState(
        fill, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
