"""Streaming sources and the run-to-completion harness.

At production scale the sources become Kafka/Kinesis and the sinks
exactly-once `foreachBatch` writers with RocksDB state store
(spark.sql.streaming.stateStore.providerClass) — the session-window
and dedup state here is the only design surface that needs sizing at
100 TB (watermarks bound it; see SURVEY.md §7 hard-parts #5).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from mpi_word_count_spark.tables import TABLES, normalize_events_ts, raw_table


def stream_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """File-source streaming read of a fixture table (schema pinned
    from the parquet footer — streaming reads never infer)."""
    if name not in TABLES:
        raise KeyError(name)
    # Pin the RAW on-disk schema (one footer read, memoized in the
    # batch catalog — tables.raw_table), then apply the same ts
    # normalization as the batch catalog so batch and stream plans
    # see identical column types.
    raw_schema = raw_table(spark, name, sf_dir).schema
    sdf = (
        spark.readStream.schema(raw_schema)
        # file stream sources take a directory; glob-filter the table
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if name == "events":
        sdf = normalize_events_ts(sdf)
    return sdf


def run_foreach_batch_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> None:
    """Drive a finite streaming DataFrame into parquet through an
    idempotent `foreachBatch` writer — the production sink pattern.

    Exactly-once without a transactional sink: each micro-batch
    OVERWRITES its own `batch_id=N` partition, so when Spark replays
    an uncommitted batch after failure (same deterministic batch id,
    tracked in the checkpoint WAL) the rewrite lands on the same path
    instead of appending duplicates. Readers see the union of batch
    partitions; in complete mode each batch carries the full result,
    so readers take max(batch_id) instead.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def run_to_completion(
    sdf: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DataFrame over a finite file source until all
    input is processed; return the final result as a batch DataFrame.

    Memory sink + processAllAvailable: the local test harness for
    batch/stream parity (the production sink is foreachBatch)."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return sdf.sparkSession.table(name)
