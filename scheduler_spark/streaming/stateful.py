"""Custom stateful streaming operator — applyInPandasWithState.

The reference keeps per-source crawl state (what was summoned, what the
bytesum was) in external stores between scheduled runs.  The Spark-native
equivalent for continuously arriving data is a grouped stateful operator:
state lives in the checkpointed state store, survives query restarts,
and is updated one Arrow batch at a time.

`track_source_progress` maintains, per source partition, a running
document count + cumulative byte total + batch counter — the live twin
of the lineage counters the batch pipeline commits per snapshot.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, total_docs long, total_bytes long, batches long"
)
STATE_SCHEMA = "total_docs long, total_bytes long, batches long"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        total_docs, total_bytes, batches = state.get
    else:
        total_docs, total_bytes, batches = 0, 0, 0
    for pdf in pdfs:
        total_docs += len(pdf)
        total_bytes += int(pdf["n_bytes"].sum())
    batches += 1
    state.update((total_docs, total_bytes, batches))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "total_docs": [total_docs],
            "total_bytes": [total_bytes],
            "batches": [batches],
        }
    )


def track_source_progress(docs_stream: DataFrame) -> DataFrame:
    """Streaming DF (source, n_bytes) → running per-source totals.

    State is keyed by source and checkpoint-persisted: a restarted query
    resumes counting where it left off (the crawl-progress analog of
    bytesum/`prov/` bookkeeping).
    """
    return docs_stream.groupBy("source").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_progress_tracker(
    spark, source_dir: str, schema, out_dir: str, checkpoint_dir: str
) -> None:
    """One AvailableNow drain of the tracker, appended to parquet.

    foreachBatch (not the memory sink — it cannot recover from a
    checkpoint) so a later drain restores the state store and resumes.
    The latest row per source (max `batches`) is the current state.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    from pyspark.sql import functions as F

    docs = stream.select("source", F.length("text").cast("long").alias("n_bytes"))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        track_source_progress(docs)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
