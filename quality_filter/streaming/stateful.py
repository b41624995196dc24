"""Custom stateful streaming operator: per-key forward fill.

The reference's video loop keeps an incremental buffer + "current
aggregate" between frames (/root/reference/opennsfw2/_inference.py:177,
207-218) — a hand-rolled keyed state machine.  Structured Streaming's
``applyInPandasWithState`` is the declarative home for that state: one
(last_value,) tuple per key, carried across micro-batches by the state
store, evicted by timeout.

Ordering contract: rows are sorted by (ts, tiebreak) INSIDE each
micro-batch; across micro-batches the operator assumes per-key arrival
order (exactly the reference's assumption for cv2 frame order).  A
late-data-tolerant variant would buffer behind a watermark.
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
