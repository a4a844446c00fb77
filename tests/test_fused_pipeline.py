"""Fused-vs-staged extraction parity.

Round-7 optimization collapsed the default extraction pipeline into one
mapInPandas stage (`pipeline._make_fused_extractor`): no crop/word/page
exchanges, no page/crop codec round-trips. The staged path is still
reachable via ``loc_hooks`` (an identity hook forces it), and both paths
share the same per-stage kernels — these tests pin the bit-for-bit
equality on every fixture family / parameter combination the declared
queries use.
"""

from __future__ import annotations

import pytest

from doctr_spark.operators.pipeline import extract_documents

IDENTITY_HOOK = [lambda df: df]  # forces the staged (pre-fusion) path


def _rows(df):
    return {
        (r["conv_id"], r["turn_idx"]): (
            r["extracted_text"],
            r["n_pages"],
            r["n_words"],
            tuple(r["pages_json"]) if r["pages_json"] is not None else None,
        )
        for r in df.collect()
    }


def _assert_parity(tdf, **kwargs):
    fused = _rows(extract_documents(tdf, **kwargs))
    staged = _rows(extract_documents(tdf, loc_hooks=IDENTITY_HOOK, **kwargs))
    assert fused == staged
    assert len(fused) > 0


def test_fused_parity_synthetic(spark):
    from doctr_spark.fixtures.transcripts import generate_transcripts

    tdf = generate_transcripts(spark, 40).persist()
    tdf.count()
    _assert_parity(tdf)
    tdf.unpersist()


def test_fused_parity_documents_derived(spark):
    from doctr_spark.io.sources import transcripts_from_documents

    _assert_parity(transcripts_from_documents(spark, "/root/testdata/sf0.001"))


def test_fused_parity_skewed_straighten(spark):
    from doctr_spark.fixtures.skew import generate_skewed_transcripts

    tdf = generate_skewed_transcripts(spark, 10).persist()
    tdf.count()
    _assert_parity(tdf, straighten_pages=True)
    tdf.unpersist()


def test_fused_parity_resampled(spark):
    from doctr_spark.fixtures.resample import generate_resampled_transcripts

    tdf = generate_resampled_transcripts(spark, 6).persist()
    tdf.count()
    _assert_parity(tdf, straighten_pages=True)
    tdf.unpersist()


def test_fused_parity_rtl(spark):
    from doctr_spark.fixtures.rtl import generate_rtl_transcripts

    tdf = generate_rtl_transcripts(spark, 8).persist()
    tdf.count()
    _assert_parity(tdf, reco_vocab="rtl", text_direction="auto")
    tdf.unpersist()


def test_fused_parity_multicolumn_reading_order(spark):
    from doctr_spark.fixtures.multicolumn import generate_multicolumn_transcripts

    tdf = generate_multicolumn_transcripts(spark, 8).persist()
    tdf.count()
    _assert_parity(tdf, keep_reading_order=True)
    _assert_parity(tdf, keep_reading_order=True, include_furniture=False)
    tdf.unpersist()


def test_fused_parity_accents(spark):
    from doctr_spark.fixtures.accents import generate_accented_transcripts

    tdf = generate_accented_transcripts(spark, 8).persist()
    tdf.count()
    _assert_parity(tdf)
    tdf.unpersist()


def test_fused_parity_pdf(spark):
    from doctr_spark.fixtures.pdfdocs import generate_pdf_transcripts

    tdf = generate_pdf_transcripts(spark, 12).persist()
    tdf.count()
    _assert_parity(tdf)
    tdf.unpersist()


def test_fused_parity_mask_and_variants(spark):
    from doctr_spark.fixtures.regions import generate_region_transcripts

    tdf = generate_region_transcripts(spark, 6).persist()
    tdf.count()
    _assert_parity(tdf, mask_region_labels=("picture",))
    _assert_parity(tdf, detect_crop_orientation=False)
    _assert_parity(tdf, resolve_blocks=True)
    _assert_parity(tdf, reco_arch="attention")
    _assert_parity(tdf, det_arch="fast_like")
    _assert_parity(tdf, det_input_size=(256, 512))
    tdf.unpersist()


def test_fused_parity_include_all_turns(spark):
    from doctr_spark.fixtures.transcripts import generate_transcripts

    tdf = generate_transcripts(spark, 20).persist()
    tdf.count()
    fused = extract_documents(tdf, include_all_turns=True)
    staged = extract_documents(tdf, include_all_turns=True, loc_hooks=IDENTITY_HOOK)
    assert _rows(fused) == _rows(staged)
    assert fused.count() == tdf.count()
    tdf.unpersist()


def test_fused_quarantines_corrupt_payloads(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "conv_id": ["c0", "c0"],
            "turn_idx": [0, 1],
            "role": ["user", "user"],
            "text": ["<doc:img>not-base64!!</doc:img>", "prose only"],
            "tool": [None, None],
            "ts": [pd.Timestamp("2024-01-01")] * 2,
        }
    )
    tdf = spark.createDataFrame(rows)
    assert extract_documents(tdf, crop_partitions=2).count() == 0


def test_fused_kie_parity(spark):
    """kie_extract's fused single-stage plan must equal the staged
    decode->detect->recognize->KIE-build pipeline row for row."""
    from doctr_spark.fixtures.transcripts import generate_transcripts
    from doctr_spark.operators.kie import kie_extract, kie_extract_staged

    tdf = generate_transcripts(spark, 30).persist()
    tdf.count()

    def rows(df):
        return {
            (r["conv_id"], r["turn_idx"], r["page_idx"]): (
                r["kie_text"],
                r["predictions_json"],
                dict(r["class_counts"]),
            )
            for r in df.collect()
        }

    fused = rows(kie_extract(tdf, crop_partitions=8))
    staged = rows(kie_extract_staged(tdf, crop_partitions=8))
    assert fused == staged and len(fused) > 0
    tdf.unpersist()


def test_fused_extract_pages_parity(spark):
    """extract_pages (fused, page-level emit) must equal the staged
    build_pages(recognize(detect_and_crop(decode_pages(...)))) chain."""
    from doctr_spark.fixtures.transcripts import generate_transcripts
    from doctr_spark.operators.build import build_pages
    from doctr_spark.operators.decode import decode_pages
    from doctr_spark.operators.detect import detect_and_crop
    from doctr_spark.operators.pipeline import extract_pages
    from doctr_spark.operators.recognize import recognize

    tdf = generate_transcripts(spark, 30).persist()
    tdf.count()

    def rows(df):
        return {
            (r["conv_id"], r["turn_idx"], r["page_idx"]): (
                r["n_words"],
                r["page_text"],
                r["page_json"],
            )
            for r in df.collect()
        }

    fused = rows(extract_pages(tdf, crop_partitions=8))
    staged = rows(build_pages(recognize(detect_and_crop(decode_pages(tdf)), num_partitions=8)))
    assert fused == staged and len(fused) > 0
    tdf.unpersist()
