"""Custom stateful streaming operator: running per-host ingest totals.

The reference GUI keeps running job counters polled from SQLite
(main.rs:758-828). The streaming twin is a keyed state machine:
``applyInPandasWithState`` holds (docs, bytes) per host across
micro-batches; each batch emits the updated running totals. State
lives in the checkpoint, so totals survive query restarts — the
GroupState analogue of the reference's durable counters.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("total_docs", LongType()),
        StructField("total_bytes", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("docs", LongType()), StructField("bytes", LongType())]
)


def _update_host_totals(key, batches, state: GroupState):
    docs, nbytes = state.get if state.exists else (0, 0)
    for pdf in batches:
        docs += len(pdf)
        nbytes += int(pdf["doc_bytes"].sum())
    state.update((docs, nbytes))
    yield pd.DataFrame(
        {"host": [key[0]], "total_docs": [docs], "total_bytes": [nbytes]}
    )


def running_host_totals(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages → running (host, total_docs, total_bytes).

    Input: a streaming DataFrame with at least (url, html). Output one
    updated row per host per micro-batch.
    """
    keyed = pages_stream.select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"),
        F.length("html").cast("long").alias("doc_bytes"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _update_host_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
