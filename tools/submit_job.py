"""Production entry point: spark-submit job for checkpointed extraction.

Launch (the north rule's deployment path):

    python -m zipfile -c /tmp/doctr_spark.zip doctr_spark
    spark-submit --py-files /tmp/doctr_spark.zip tools/submit_job.py \\
        --input <transcripts parquet/Iceberg table> \\
        --output <output dir> --manifest <manifest dir> \\
        [--buckets 256] [--synthetic-convs N]

On a cluster add ``--master yarn/k8s --num-executors ...``; the job itself
is deployment-agnostic (the SparkSession comes from spark-submit, not from
the session factory). Resumable: re-running with the same manifest dir
processes only incomplete buckets.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser(description="doctr_spark extraction job")
    parser.add_argument("--input", help="transcripts parquet path or Iceberg table name")
    parser.add_argument("--synthetic-convs", type=int, default=0, help="generate N conversations instead of reading --input")
    parser.add_argument("--output", required=True)
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--buckets", type=int, default=16)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("doctr_spark_extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from doctr_spark.fixtures.transcripts import generate_transcripts
    from doctr_spark.io.sources import read_transcripts
    from doctr_spark.streaming.incremental import run_checkpointed

    if args.synthetic_convs:
        transcripts = generate_transcripts(spark, args.synthetic_convs)
    elif args.input:
        transcripts = read_transcripts(spark, args.input)
    else:
        raise SystemExit("one of --input / --synthetic-convs is required")

    t0 = time.perf_counter()
    done = run_checkpointed(spark, transcripts, args.output, args.manifest, n_buckets=args.buckets)
    stats = spark.read.parquet(args.output).agg({"n_words": "sum", "*": "count"}).collect()[0]
    print(json.dumps({
        "buckets_processed": done,
        "turns": stats["count(1)"],
        "words": int(stats["sum(n_words)"] or 0),
        "sec": round(time.perf_counter() - t0, 2),
    }))  # fmt: skip
    spark.stop()


if __name__ == "__main__":
    main()
