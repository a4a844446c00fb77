"""Noop-sink isolated per-query benchmarks (optimization guide §1.4).

`bench.py` is the driver's frozen harness; this file holds the round-7
MEASUREMENT extras: each headline query timed in isolation against the
built-in noop sink (so the computation is timed, not the sink or a
count's column pruning), median of N repeats, with job descriptions so
the (disabled-by-default) UI stays readable when re-enabled.

Usage:  python bench_extra.py [reps]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
        SPARK_GRAFT_CPUS   (default 32; master local[$SPARK_GRAFT_CPUS])
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_cores = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)

    from doctr_spark.fixtures.transcripts import generate_transcripts, n_convs_for_sf
    from doctr_spark.io.sources import transcripts_from_documents
    from doctr_spark.operators import dedup, similarity
    from doctr_spark.operators.pipeline import extract_documents
    from doctr_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"doctr_spark_bench_extra_{cpus}",
        shuffle_partitions=max(2 * n_cores, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    # warm both pipeline entries, like bench.py
    extract_documents(generate_transcripts(spark, 20)).count()
    warm_dir = sf_dir[: m.start(1)] + "0.01" + sf_dir[m.end(1) :] if m else sf_dir
    if warm_dir != sf_dir and os.path.isdir(warm_dir):
        extract_documents(transcripts_from_documents(spark, warm_dir)).count()

    tdf = generate_transcripts(spark, n_convs_for_sf(sf)).persist()
    tdf.count()

    queries = {
        "q1_ocr_documents": lambda: noop(
            extract_documents(transcripts_from_documents(spark, sf_dir))
        ),
        "q2_ocr_synthetic": lambda: noop(extract_documents(tdf)),
        # q3/q5's operators already end in internal actions (eager persist) /
        # return small tables; the noop still forces every column
        "q3_dedup_minhash_lsh": lambda: noop(dedup.minhash_lsh_pairs(spark, sf_dir)),
        "q4_similarity_topk": lambda: noop(similarity.cosine_topk(spark, sf_dir)),
        "q5_dedup_simhash": lambda: noop(dedup.simhash(spark, sf_dir)),
    }

    out: dict[str, dict] = {}
    for name, fn in queries.items():
        samples = []
        for i in range(reps):
            sc.setJobDescription(f"{name} rep{i} (noop-isolated)")
            t0 = time.perf_counter()
            fn()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache() if name.startswith("q3") else None
            sc.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "samples": samples,
        }
    tdf.unpersist(blocking=True)
    print(json.dumps({"sf": sf, "cpus": n_cores, "reps": reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
