"""Training-data pipeline operators added in round 3: repeated-span
mining, benchmark decontamination, PII scrubbing."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812

SF = "/root/testdata/sf0.001"


def test_substring_spans_finds_repeats(spark):
    from doctr_spark.operators.dedup import SPAN_K, SPAN_MIN_OCC, substring_spans

    rows = substring_spans(spark, SF).collect()
    assert rows, "corpus has repeated spans"
    for r in rows:
        assert len(r["span"].split(" ")) == SPAN_K
        assert r["n_occurrences"] >= SPAN_MIN_OCC
        assert 1 <= r["n_docs"] <= r["n_occurrences"]
    occ = [r["n_occurrences"] for r in rows]
    assert occ == sorted(occ, reverse=True)


def test_decontaminate_excludes_eval_slice(spark):
    from doctr_spark.operators.dedup import EVAL_MOD, decontaminate

    df = decontaminate(spark, SF)
    rows = df.collect()
    assert all(r["doc_id"] % EVAL_MOD != 0 for r in rows)
    # exact duplicates of eval docs exist in this corpus -> hits found
    assert any(r["contaminated"] for r in rows)
    assert all((r["n_hits"] > 0) == r["contaminated"] for r in rows)


def test_pii_scrub_counts_and_redacts(spark):
    from doctr_spark.operators.text_analysis import pii_scrub

    rows = pii_scrub(spark, SF).collect()
    # every synthesized doc carries exactly one email and one phone
    assert all(r["n_emails"] == 1 and r["n_phones"] == 1 for r in rows)
    assert all(len(r["redacted_md5"]) == 32 for r in rows)


def test_mix_sample_rates_and_determinism(spark):
    from doctr_spark.operators.text_analysis import MIX_THRESHOLDS, mix_sample

    a = mix_sample(spark, SF)
    rates = {r["source"]: r["n"] for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # src0 threshold 'ff' keeps ~all 25 docs; src2 ('20' = 12.5%) keeps few
    assert rates.get("src0", 0) >= 20
    assert rates.get("src2", 0) <= 10
    assert rates.get("src2", 0) < rates.get("src3", 0)  # '20' < 'c0'
    # pure function of content: a second run keeps the identical sample
    b = sorted(map(str, mix_sample(spark, SF).collect()))
    assert sorted(map(str, a.collect())) == b


def test_ivf_assign_paths_agree(spark):
    """The constant-folded literal and the sc.broadcast mapInPandas argmax
    must produce identical IVF results (operators/similarity.py)."""
    from doctr_spark.operators import similarity

    sf = "/root/testdata/sf0.001"
    lit = similarity.ivf_ann(spark, sf, assign_mode="literal").collect()
    bc = similarity.ivf_ann(spark, sf, assign_mode="broadcast").collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(lit, key=key) == sorted(bc, key=key)
