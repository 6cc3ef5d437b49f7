"""Custom stateful streaming operator via applyInPandasWithState:
running per-key counters/sums that persist across micro-batches
(SURVEY §2.9 'beyond parity': the reference has no session state at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_total", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def running_totals(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Streaming groupBy(key) -> emit (key, running count, running sum)
    once per key per micro-batch. State = (n, s), no timeout (counters
    are cumulative forever; add a timeout for TTL semantics)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({"key": [key[0]], "n_total": [n], "sum_value": [s]})

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_ALERT_STATE_SCHEMA = T.StructType([T.StructField("cents", T.LongType())])


def threshold_alerts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold_cents: int,
) -> DataFrame:
    """Streaming per-key spend alerting: maintain a cumulative INTEGER
    cents total per key; each time the total crosses another multiple
    of `threshold_cents`, emit ONE (key, alert_level) row.

    Batch-split invariance by construction: values are non-negative, so
    the set of levels crossed depends only on the FINAL total — however
    the stream is micro-batched, exactly the rows (key, 1..floor(total/
    T)) are emitted, which is what the batch oracle computes. The state
    is one int64 per key, and the per-row cents conversion uses the
    same floor(v*100+0.5) the engine-side queries use, so stream, batch
    and DuckDB all agree bit-for-bit.

    The output schema is built from `key_col` — name AND type are taken
    from the input frame's key column, so a caller grouping on e.g.
    `supplier_id: string` gets (supplier_id string, alert_level long),
    not a misnamed hardcoded column."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("alert_level", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (tot,) = state.get if state.exists else (0,)
        prev_level = tot // threshold_cents
        for pdf in pdfs:
            cents = np.floor(pdf[value_col].to_numpy() * 100 + 0.5).astype(
                "int64"
            )
            tot += int(cents.sum())
        state.update((tot,))
        new_level = tot // threshold_cents
        if new_level > prev_level:
            levels = list(range(prev_level + 1, new_level + 1))
            yield pd.DataFrame(
                {key_col: [key[0]] * len(levels), "alert_level": levels}
            )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
