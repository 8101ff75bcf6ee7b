"""Stateful streaming operator: last-value carry-forward (OP-64).

The reference's FRED feed carries the last observed value forward
indefinitely (integrate/main.py:72 ``resample('1H').ffill()``) — in batch
that is the unbounded-preceding window (operators/timegrid.py); across
micro-batches it is per-key state: ``applyInPandasWithState`` keeping one
float per indicator. State size is O(#keys), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "indicator string, ts timestamp, value double, filled boolean"
STATE_SCHEMA = "last_value double"


def _carry_forward(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (indicator,) = key
    last = state.get[0] if state.exists else None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        out_vals, filled = [], []
        for v in pdf["value"]:
            if pd.isna(v):
                out_vals.append(last)
                filled.append(True)
            else:
                last = float(v)
                out_vals.append(last)
                filled.append(False)
        yield pd.DataFrame(
            {
                "indicator": indicator,
                "ts": pdf["ts"],
                "value": out_vals,
                "filled": filled,
            }
        )
    state.update((last,))


def stateful_ffill(long_stream: DataFrame) -> DataFrame:
    """(indicator, ts, value?) stream → value carried forward per indicator
    across micro-batches. Keys partition the state; no global ordering is
    assumed beyond per-batch sort (the reference's scheduler guarantees
    in-order arrival; late data would be handled by the watermarked path)."""
    return long_stream.groupBy("indicator").applyInPandasWithState(
        _carry_forward,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
