"""Checkpointed, resumable extraction runs.

The 10^12-turn job must survive restarts without recomputing finished work
(north rule: "resumable from checkpoint with per-partition lineage +
metrics"). Design — the Spark/Iceberg-native equivalent of a streaming
checkpoint, with no state store:

* input is bucketed by ``pmod(xxhash64(conv_id), n_buckets)`` — a stable,
  data-independent partitioning (conversations never straddle buckets, so
  per-turn outputs are complete per bucket);
* each completed bucket appends its extraction output (parquet/Iceberg
  partitioned by bucket) and then a manifest row
  ``(bucket, status, n_turns, n_words, started_at, finished_at, run_id)``
  — the manifest write is the commit point, so a crash mid-bucket leaves
  at most one bucket to redo (output overwrite per bucket is idempotent:
  dynamic partition overwrite);
* on restart, remaining work = all buckets anti-joined against
  ``manifest.status = 'done'``.

On Iceberg the manifest is a table and each bucket commit is a snapshot;
here it is a parquet directory with one file per bucket commit, which has
the same append-only, idempotent-redo semantics.
"""

from __future__ import annotations

import datetime as dt

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

MANIFEST_SCHEMA = (
    "bucket int, status string, n_turns long, n_words long, "
    "started_at timestamp, finished_at timestamp, run_id string"
)


def with_bucket(transcripts: DataFrame, n_buckets: int) -> DataFrame:
    return transcripts.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, manifest_dir: str) -> list[int]:
    # probe through Spark's filesystem layer (works on HDFS/S3/local alike,
    # unlike os.path which would silently disable resume on a cluster)
    try:
        m = spark.read.parquet(manifest_dir)
    except Exception:  # no manifest yet (AnalysisException: path not found)
        return []
    return [r["bucket"] for r in m.where(F.col("status") == "done").select("bucket").distinct().collect()]


def run_checkpointed(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    manifest_dir: str,
    n_buckets: int = 16,
    fail_after: int | None = None,
) -> int:
    """Process all not-yet-done buckets; returns the number processed.

    ``fail_after`` aborts after N bucket commits (test hook for the
    resume-from-checkpoint path).
    """
    from doctr_spark.operators.pipeline import extract_documents

    run_id = uuid.uuid4().hex[:12]
    bucketed = with_bucket(transcripts, n_buckets)
    done = set(completed_buckets(spark, manifest_dir))
    todo = [b for b in range(n_buckets) if b not in done]

    processed = 0
    for bucket in todo:
        started = dt.datetime.now()
        part = bucketed.where(F.col("bucket") == bucket).drop("bucket")
        docs = extract_documents(part).withColumn("bucket", F.lit(bucket))
        docs.write.mode("overwrite").parquet(f"{output_dir}/bucket={bucket}")
        # stats from the files just written: a second action on `docs`
        # would re-run the whole extraction lineage for this bucket
        stats = (
            spark.read.parquet(f"{output_dir}/bucket={bucket}")
            .agg(F.count("*").alias("n_turns"), F.sum("n_words").alias("n_words"))
            .collect()[0]
        )
        manifest_row = spark.createDataFrame(
            [
                (
                    bucket,
                    "done",
                    int(stats["n_turns"]),
                    int(stats["n_words"] or 0),
                    started,
                    dt.datetime.now(),
                    run_id,
                )
            ],
            MANIFEST_SCHEMA,
        )
        manifest_row.write.mode("append").parquet(manifest_dir)
        processed += 1
        if fail_after is not None and processed >= fail_after:
            break
    return processed
