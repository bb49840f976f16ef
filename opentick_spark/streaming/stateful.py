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


def _topk_values(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-key running top-3 `value`s (ties broken by smaller event_id),
    maintained across micro-batches. Order-statistics state: unlike the
    running-totals fold this keeps a bounded SET of extremes, and its
    final state is batch-order-insensitive — the oracle property."""
    if state.exists:
        vals, ids, n = list(state.get[0]), list(state.get[1]), state.get[2]
    else:
        vals, ids, n = [], [], 0
    pairs = list(zip(vals, ids))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        pairs.extend(zip(pdf["value"].tolist(), pdf["event_id"].tolist()))
        pairs.sort(key=lambda p: (-p[0], p[1]))
        del pairs[3:]
    state.update((
        [p[0] for p in pairs],
        [int(p[1]) for p in pairs],
        n,
    ))
    row = {"user_id": [key[0]], "n_seen": [n]}
    for i in range(3):
        row[f"top{i + 1}"] = [pairs[i][0] if i < len(pairs) else None]
    yield pd.DataFrame(row)


def stateful_topk_values(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    sink_table: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """File stream → per-user running top-3 values with explicit keyed
    order-statistics state (3 floats + 3 ids per key, regardless of
    stream volume). Update-mode memory sink; the row with the highest
    ``n_seen`` per key is the final state."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _topk_values,
        outputStructType=(
            "user_id long, n_seen long, top1 double, top2 double, top3 double"
        ),
        stateStructType="vals array<double>, ids array<long>, n long",
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
