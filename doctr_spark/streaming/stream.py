"""Structured Streaming front-end for the extraction pipeline.

The reference has no streaming semantics (SURVEY.md §2.10) and the north
rule is batch, but continuously-arriving transcript files are the natural
production shape, so the engine also exposes the same batch pipeline as a
`foreachBatch` sink: each micro-batch of newly-arrived transcript files
runs `extract_documents` unchanged and appends to the output — exactly-once
is delegated to the streaming checkpoint (file-source offsets) plus
append-only parquet per micro-batch. No stateful operators are needed: the
per-turn extraction is stateless, so watermarks/state stores don't apply.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..fixtures.transcripts import TRANSCRIPTS_SCHEMA
from ..operators.pipeline import extract_documents


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    crop_partitions: int | None = None,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Watch ``input_dir`` for transcript parquet files and extract them
    incrementally. Returns the started StreamingQuery."""
    source = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        docs = extract_documents(batch_df, crop_partitions=crop_partitions)
        # idempotent per micro-batch: a replayed batch (crash after write,
        # before the offset commit) overwrites its own batch directory
        # instead of appending duplicates — this is what makes foreachBatch
        # + file-source offsets exactly-once
        docs.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    return (
        source.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
