"""Custom stateful streaming operators (applyInPandasWithState).

Training-data pipeline operators on unbounded inputs — the streaming twins
of the batch dedup/aggregation suite:

- :func:`streaming_dedup` — exactly-first-occurrence document dedup: state
  keyed by content fingerprint remembers the first doc id seen; later
  duplicates are dropped ACROSS micro-batches (a plain
  ``dropDuplicates`` on a stream would keep unbounded state with no
  eviction contract and no keeper column). State per key is one row; at
  100 TB the state store shards by fingerprint across executors exactly
  like the batch groupBy — RocksDB state store on a real cluster.
- :func:`windowed_event_counts` — watermarked tumbling-window aggregate
  (late rows beyond the watermark are dropped by the engine; the batch
  twin is the driver's ``events_windowed`` query).

Both run under ``trigger=availableNow`` for batch-incremental refreshes or
continuous micro-batches, same as :mod:`webgraph_spark.streaming.ingest`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "fp string, doc_id long, text string"
_DEDUP_STATE_SCHEMA = "keeper long"


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit only the first-ever document per fingerprint key.

    State is the keeper doc id; within a batch the minimum doc id wins
    (deterministic), matching the batch ``dedup_exact`` keeper rule.
    """
    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        # key already seen in an earlier batch: everything here is a dup
        return iter(())
    if rows.empty:
        return iter(())
    first = rows.loc[rows["doc_id"].idxmin()]
    state.update((int(first["doc_id"]),))
    yield pd.DataFrame(
        {
            "fp": [key[0]],
            "doc_id": [int(first["doc_id"])],
            "text": [first["text"]],
        }
    )


def streaming_dedup(docs_stream: DataFrame) -> DataFrame:
    """Streaming exact dedup: ``(doc_id, text)`` stream → first occurrence
    per normalized-content fingerprint, exactly once across batches."""
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    keyed = docs_stream.select(
        F.sha2(norm, 256).alias("fp"), "doc_id", "text"
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type: the streaming twin
    of the driver's ``events_windowed`` batch query. Rows later than
    ``watermark`` behind the max observed ``ts`` are dropped by the engine
    (documented late-data contract)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day"), "event_type", "n", "total_value"
        )
    )
