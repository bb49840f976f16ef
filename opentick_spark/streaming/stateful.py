"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming surface (SURVEY §2.6) — this is
the extension layer for operators that need cross-micro-batch state
beyond what watermarked window aggregates express. Pattern: group the
stream by key, hold compact per-key state (a tuple of scalars — NOT the
rows), emit updates per batch. State lives in the state store
(checkpointed, partitioned by key), so a 1000-executor cluster scales by
key cardinality, not stream volume.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _running_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-key running (count, sum, min, max) over `value`, maintained
    across micro-batches; emits the updated totals once per batch."""
    if state.exists:
        n, s, mn, mx = state.get
    else:
        n, s, mn, mx = 0, 0.0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        s += float(pdf["value"].sum())
        bmn = float(pdf["value"].min())
        bmx = float(pdf["value"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, s, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "sum_value": [s],
            "min_value": [mn],
            "max_value": [mx],
        }
    )


def stateful_running_totals(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    sink_table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """File stream → per-user running totals with explicit keyed state.

    Update-mode memory sink: each micro-batch appends the refreshed
    totals for the keys it touched; the row with the highest ``n`` per
    key is the final state. Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=(
            "user_id long, n long, sum_value double, "
            "min_value double, max_value double"
        ),
        stateStructType="n long, sum_value double, min_value double, max_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
