"""Custom stateful streaming operator via applyInPandasWithState —
the extension point for semantics Spark's built-in stateful ops don't
cover (the reference has none of these; its only state is the join's).

``running_risk_state`` keeps (count, sum, min, max) per customer across
micro-batches and emits the updated aggregate for every customer seen
in the batch — the incremental version of the risk-score stub, with
O(customers) state and Arrow-batched group processing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "customer string, n_assessments bigint, avg_score double, "
    "min_score double, max_score double"
)
STATE_SCHEMA = "count bigint, total double, mn double, mx double"


def _update_risk_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    count, total, mn, mx = (
        state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:
        # Null scores (parse_risk_events is tolerant of malformed
        # payloads) must be IGNORED like SQL aggregates ignore them —
        # astype turns None into NaN, and one NaN in sum() would
        # otherwise poison total (and every later emission for this
        # customer) permanently via state.update.
        scores = pdf["score"].astype("float64").dropna()
        count += int(scores.size)
        total += float(scores.sum())
        if scores.size:
            mn = min(mn, float(scores.min()))
            mx = max(mx, float(scores.max()))
    if count == 0:
        # Every score seen so far was null: nothing to aggregate yet
        # (the SQL twin's avg/min/max would be NULL). Emit nothing and
        # leave state untouched rather than publishing 0.0/±inf.
        return
    state.update((count, total, mn, mx))
    yield pd.DataFrame(
        {
            "customer": [key[0]],
            "n_assessments": [count],
            "avg_score": [round(total / count, 6) if count else 0.0],
            "min_score": [round(mn, 6)],
            "max_score": [round(mx, 6)],
        }
    )


def running_risk_state(risk_stream: DataFrame) -> DataFrame:
    """Apply the stateful per-customer risk aggregate to a streaming
    DataFrame with columns (customer string, score float/double)."""
    return (
        risk_stream.groupBy("customer")
        .applyInPandasWithState(
            _update_risk_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
