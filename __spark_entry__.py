"""Driver contract for the doctr_spark engine.

``entry(spark)`` runs the flagship extraction (detection -> recognition ->
reconstruction over payload-bearing transcripts derived from the sf0.001
documents table). ``queries()`` exposes every implemented operator;
``oracle_sql()`` gives the DuckDB twin for each SQL-expressible one —
including the flagship OCR pipeline itself, whose expected per-turn output
is a pure string transformation of the source documents.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from doctr_spark.io.sources import transcripts_from_documents
from doctr_spark.operators import dedup, relational, similarity, text_analysis
from doctr_spark.operators.decode import decode_pages
from doctr_spark.operators.multimodal import media_metadata
from doctr_spark.operators.pipeline import extract_documents

# Expectation staging for queries whose input is the in-session synthetic
# fixture rather than a driver parquet: the generator's ground truth (a pure
# function of the layout engine, computed BEFORE payload packing) is written
# to a scratch parquet at query-build time so the DuckDB oracle can read it.
ORACLE_SCRATCH = "/root/repo/.oracle"


def _stage_expectation(df: DataFrame, name: str) -> str:
    path = f"{ORACLE_SCRATCH}/{name}"
    df.write.mode("overwrite").parquet(path)
    return path


# ---------------------------------------------------------------------------
# OCR pipeline queries
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
SELECT source AS conv_id,
       (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS flat_text
FROM documents
"""

_WORD_STATS_ORACLE = """
WITH c AS (
    SELECT source AS conv_id,
           (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS cleaned
    FROM documents
)
SELECT conv_id, turn_idx,
       (CASE WHEN cleaned = '' THEN 0 ELSE len(string_split(cleaned, ' ')) END)::BIGINT AS n_words
FROM c
"""


def ocr_extract_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full OCR pipeline over documents-derived transcripts; the
    flattened text must equal the cleaned source token stream."""
    t = transcripts_from_documents(spark, sf_dir)
    docs = extract_documents(t)
    return docs.select(
        "conv_id",
        "turn_idx",
        F.regexp_replace("extracted_text", "\n+", " ").alias("flat_text"),
    )


def ocr_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    docs = extract_documents(t)
    return docs.select("conv_id", "turn_idx", F.col("n_words").cast("long").alias("n_words"))


_KIE_ORACLE = """
WITH cleaned AS (
    SELECT source AS conv_id,
           (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS txt
    FROM documents
), c AS (
    SELECT conv_id, turn_idx,
           CASE WHEN txt = '' THEN []::VARCHAR[] ELSE string_split(txt, ' ') END AS toks
    FROM cleaned
)
SELECT conv_id, turn_idx,
       len(list_filter(toks, t -> regexp_full_match(t, '[0-9]+')))::BIGINT AS n_number,
       len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+')))::BIGINT AS n_alpha,
       len(list_filter(toks, t -> NOT regexp_full_match(t, '[0-9]+')
                                  AND NOT regexp_full_match(t, '[a-z]+')))::BIGINT AS n_mixed
FROM c
"""


def kie_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full KIE pipeline (per-class span grouping) over documents-derived
    transcripts; per-turn class counts must equal SQL token classification."""
    from doctr_spark.operators.kie import kie_class_counts, kie_extract

    return kie_class_counts(kie_extract(transcripts_from_documents(spark, sf_dir)))


_KIE_VALUES_ORACLE = """
WITH cleaned AS (
    SELECT source AS conv_id,
           (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS txt
    FROM documents
), c AS (
    SELECT conv_id, turn_idx,
           CASE WHEN txt = '' THEN []::VARCHAR[] ELSE string_split(txt, ' ') END AS toks
    FROM cleaned
)
SELECT conv_id, turn_idx,
       coalesce(array_to_string(list_sort(list_filter(toks, t -> regexp_full_match(t, '[0-9]+'))), ' '), '')
           AS number_vals,
       coalesce(array_to_string(list_sort(list_filter(toks, t -> regexp_full_match(t, '[a-z]+'))), ' '), '')
           AS alpha_vals,
       coalesce(array_to_string(list_sort(list_filter(toks,
           t -> NOT regexp_full_match(t, '[0-9]+') AND NOT regexp_full_match(t, '[a-z]+'))), ' '), '')
           AS mixed_vals
FROM c
"""


def kie_values_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KIE content-level check: per-turn SORTED prediction values per class
    must equal the SQL token classifier's sorted token lists — proving the
    per-class extraction CONTENT, not just its cardinality."""
    from doctr_spark.operators.kie import kie_class_values, kie_extract

    return kie_class_values(kie_extract(transcripts_from_documents(spark, sf_dir)))


# The export formats are XML/markup the oracle can't re-derive
# bbox-for-bbox, but stripping the (golden-tested, tests/test_exporters_kie
# .py) markup must give back exactly the flagship token stream for EVERY
# format, and hOCR's ocrx_word span count must equal the SQL word count —
# so the whole export surface is oracle-checked end-to-end modulo markup.
# One union-tagged query covers hOCR/markdown/asciidoc/html: the driver
# records correctness rows for at most 50 queries, and the four formats
# share one pipeline pass this way instead of recomputing it per format.
_EXPORT_FMT_ORACLE = """
WITH c AS (
    SELECT source AS conv_id,
           (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS cleaned
    FROM documents
)
SELECT f.fmt, c.conv_id, c.turn_idx, c.cleaned AS export_text,
       (CASE WHEN c.cleaned = '' THEN 0
             ELSE len(string_split(c.cleaned, ' ')) END)::BIGINT AS n_words
FROM c
CROSS JOIN (SELECT unnest(['hocr', 'markdown', 'asciidoc', 'html']) AS fmt) f
"""


def export_formats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole export surface in one slot: hOCR
    (`kernels.exporters.export_hocr`), markdown (reference
    `doctr/io/exporters.py:436-471`), AsciiDoc (`:474-509`) and HTML
    (`:512-540`) rendered from ONE shared pipeline pass, each projected to
    its markup-stripped text + word count and union-tagged by format. For
    hOCR the word count is the ocrx_word SPAN count — the markup must carry
    exactly one span per word, a stronger check than re-counting tokens.

    Returns an eagerly materialized PERSISTED DataFrame (the shared built
    pass is cached only while the four exports render, then freed)."""
    from doctr_spark.operators.kie import export_documents
    from doctr_spark.operators.pipeline import extract_pages

    t = transcripts_from_documents(spark, sf_dir)
    # fused page-level pipeline (round 7): one Arrow stage to built pages
    # instead of the staged decode/detect/recognize/groupBy chain —
    # identical rows (tests/test_fused_pipeline.py parity)
    built = extract_pages(t).persist()
    built.count()  # eager: all four export branches share this one pass
    outs = []
    for fmt in ("hocr", "markdown", "asciidoc", "html"):
        doc = export_documents(built, fmt)
        if fmt in ("hocr", "html"):
            flat = F.trim(
                F.regexp_replace(F.regexp_replace("content", "<[^>]+>", " "), r"\s+", " ")
            )
        else:
            # undo line-leading neutralization only (markdown "\\",
            # asciidoc "{empty}"), drop the page separator, collapse
            lead = r"(^|\n)\\" if fmt == "markdown" else r"(^|\n)\{empty\}"
            brk = r"\n\n---\n\n" if fmt == "markdown" else r"\n\n<<<\n\n"
            stripped = F.regexp_replace("content", lead, "$1")
            flat = F.trim(
                F.regexp_replace(F.regexp_replace(stripped, brk, " "), r"\s+", " ")
            )
        if fmt == "hocr":
            n_words = (F.size(F.split("content", "class='ocrx_word'")) - 1).cast("long")
        else:
            n_words = (
                F.when(flat == "", F.lit(0)).otherwise(F.size(F.split(flat, " "))).cast("long")
            )
        outs.append(
            doc.select(
                F.lit(fmt).alias("fmt"),
                "conv_id",
                "turn_idx",
                flat.alias("export_text"),
                n_words.alias("n_words"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    out = out.persist()
    out.count()  # eager: swap the page-bearing built cache for the text rows
    built.unpersist()
    return out


_PDF_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, gt_text AS extracted_text,
       n_pages::BIGINT AS n_pages, n_words::BIGINT AS n_words
FROM read_parquet('{ORACLE_SCRATCH}/pdf_gt/*.parquet')
"""


def ocr_extract_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ``%PDF-`` input end to end: payloads are genuine PDF byte
    streams written and parsed by the from-scratch codecs (`kernels/
    {pdf,pdfenc,pdfcrypt,jpeg,ccitt,jbig2,jpx}.py`, public ISO/ITU specs),
    rasterized in the glyph font and pushed through the full pipeline.
    The fixture cycles 25 writer layouts: raw/Flate/LZW/A85/RunLength/
    AHx streams, TJ kerning, Tf scaling, PDF 1.5 object+xref streams,
    scanned pages as 1/8-bit, JPEG (baseline+progressive), CCITT G4,
    JBIG2, and JPEG 2000 (5/3 lossless and 9/7 lossy) image XObjects,
    inline images, form XObjects, /Rotate and CTM-rotated sideways scans,
    RC4/AES-128/AES-256 encryption, the §9.6-9.10 font-encoding layer
    (Type0/Identity-H ToUnicode CMaps, /Differences, bare-ToUnicode,
    mixed multi-font pages, Type3 glyph-procedure layers, declared width
    tables), and §7.5.6 incremental updates (decoy base text replaced by
    appended object redefinitions). Oracle =
    the generator's word layout. PDFs beyond the subset (non-empty
    passwords, skewed Type3 FontMatrix, skewed CTMs) still fail loudly
    (reference swap-in point: pypdfium2, `doctr/io/pdf.py:16-43`)."""
    from doctr_spark.fixtures.pdfdocs import generate_pdf_transcripts

    tdf, gdf = generate_pdf_transcripts(spark, 40, with_gt=True)
    _stage_expectation(gdf, "pdf_gt")
    return extract_documents(tdf).select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_words").cast("long").alias("n_words"),
    )


_ROUNDTRIP_ORACLE = """
SELECT source AS conv_id,
       (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS flat_text,
       TRUE AS roundtrip_ok
FROM documents
"""


def export_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Document.from_dict`` round trip end to end (reference
    `doctr/io/elements.py:115-118,503-512`): extract the flagship corpus,
    re-import every turn's exported ``pages_json`` through the validating
    element re-builder, and re-render. ``roundtrip_ok`` asserts re-render ==
    original per turn; ``flat_text`` must still equal the cleaned source
    token stream, proving the re-imported structure carries the full text."""
    from doctr_spark.operators.kie import documents_from_json

    t = transcripts_from_documents(spark, sf_dir)
    rt = documents_from_json(extract_documents(t))
    return rt.select(
        "conv_id",
        "turn_idx",
        F.regexp_replace("rendered_text", "\n+", " ").alias("flat_text"),
        "roundtrip_ok",
    )


_SYNTH_RT_ORACLE = """
SELECT source AS conv_id,
       (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)::INT AS turn_idx,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS flat_text,
       TRUE AS roundtrip_ok
FROM documents
"""


def export_synthesize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full visual round trip (reference ``synthesize_page``,
    `doctr/utils/reconstitution.py:128-279`): extract the flagship corpus,
    re-render every exported page back to an image at its exported word
    geometry, run the ENTIRE pipeline again on the synthesized pages, and
    assert the re-extraction equals the original per turn — synthesis is a
    true inverse of extraction, corpus-wide."""
    from doctr_spark.operators.kie import synthesize_transcripts

    t = transcripts_from_documents(spark, sf_dir)
    docs = extract_documents(t).persist()
    docs.count()  # eager: both the synthesize branch and the join read it
    re_docs = extract_documents(synthesize_transcripts(docs)).select(
        "conv_id", "turn_idx", F.col("extracted_text").alias("re_text")
    )
    j = docs.select("conv_id", "turn_idx", "extracted_text").join(
        re_docs, ["conv_id", "turn_idx"], "left"
    )
    out = j.select(
        "conv_id",
        "turn_idx",
        F.regexp_replace("re_text", "\n+", " ").alias("flat_text"),
        (F.col("re_text") == F.col("extracted_text")).alias("roundtrip_ok"),
    ).persist()
    out.count()  # eager: swap the page-bearing docs cache for the tiny result
    docs.unpersist()
    return out


_TABLE_CELL_ORACLE = f"""
SELECT page_key, n_gt::BIGINT AS n_gt, n_pred::BIGINT AS n_pred,
       n_matched::BIGINT AS n_matched, recall::DOUBLE AS recall,
       precision::DOUBLE AS precision, f1::DOUBLE AS f1,
       structure_acc::DOUBLE AS structure_acc
FROM read_parquet('{ORACLE_SCRATCH}/tcell_gt/*.parquet')
"""


def metric_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TableCellMetric`` end to end (reference `doctr/utils/metrics.py:
    315-397`): ruled-grid pages flow through decode + the detect stage's
    table-structure sideband; predicted cells Hungarian-match the
    generator's exact interior-box ground truth. Odd pages plant one
    phantom GT cell with no rulings, so the staged expectation is ANALYTIC
    — recall = cells/(cells+phantom), precision = structure accuracy = 1."""
    from doctr_spark.fixtures.tables import generate_table_metric_transcripts
    from doctr_spark.operators.detect import detect_and_crop
    from doctr_spark.operators.metrics import table_cells_per_page

    tdf, gdf = generate_table_metric_transcripts(spark, 30, with_gt=True)
    n_gt = (F.col("n_cells") + F.col("n_phantom")).cast("long")
    exp = gdf.select(
        F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string")).alias("page_key"),
        n_gt.alias("n_gt"),
        F.col("n_cells").cast("long").alias("n_pred"),
        F.col("n_cells").cast("long").alias("n_matched"),
        F.round(F.col("n_cells") / n_gt, 6).alias("recall"),
        F.lit(1.0).alias("precision"),
        F.round(2 * F.col("n_cells") / (n_gt + F.col("n_cells")), 6).alias("f1"),
        F.lit(1.0).alias("structure_acc"),
    )
    _stage_expectation(exp, "tcell_gt")

    tables_schema = (
        "array<struct<cells: array<struct<geometry: array<double>, row_start: int, "
        "row_end: int, col_start: int, col_end: int>>, num_rows: int, num_cols: int>>"
    )
    crops = detect_and_crop(decode_pages(tdf))
    preds = (
        crops.where(F.col("word_idx") == -2)
        .select("conv_id", "turn_idx", F.from_json("aux", tables_schema).alias("t"))
        .select(
            "conv_id",
            "turn_idx",
            F.flatten(
                F.transform("t", lambda tb: F.transform(tb["cells"], lambda c: c["geometry"]))
            ).alias("pred_cells"),
            F.flatten(
                F.transform(
                    "t",
                    lambda tb: F.transform(
                        tb["cells"],
                        lambda c: F.array(
                            c["col_start"], c["col_end"], c["row_start"], c["row_end"]
                        ),
                    ),
                )
            ).alias("pred_logic"),
        )
    )
    pairs = gdf.join(preds, ["conv_id", "turn_idx"], "left").select(
        F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string")).alias("page_key"),
        "gt_cells",
        "gt_logic",
        F.coalesce("pred_cells", F.array().cast("array<array<double>>")).alias("pred_cells"),
        F.coalesce("pred_logic", F.array().cast("array<array<int>>")).alias("pred_logic"),
    )
    per = table_cells_per_page(pairs)
    return per.select(
        "page_key",
        "n_gt",
        "n_pred",
        "n_matched",
        F.round(F.col("n_matched") / F.col("n_gt"), 6).alias("recall"),
        F.round(F.col("n_matched") / F.col("n_pred"), 6).alias("precision"),
        F.round(2 * F.col("n_matched") / (F.col("n_gt") + F.col("n_pred")), 6).alias("f1"),
        F.round(F.col("n_struct") / F.col("n_matched"), 6).alias("structure_acc"),
    )


def _metric_geometry_iou(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doctr_spark.operators.metrics import geometry_iou_events

    return geometry_iou_events(spark, sf_dir)


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


_SYNTH_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, gt_text AS extracted_text,
       n_pages::BIGINT AS n_pages, n_words::BIGINT AS n_words
FROM read_parquet('{ORACLE_SCRATCH}/synth_gt/*.parquet')
"""


def ocr_extract_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native synthetic transcripts (skewed conversations, img/pdf/html
    payloads, multi-page docs, wide-word split path). The oracle is the
    generator's own ground-truth table, staged to parquet for DuckDB."""
    from doctr_spark.fixtures.transcripts import generate_transcripts, n_convs_for_sf

    tdf, gdf = generate_transcripts(spark, n_convs_for_sf(_sf_from_dir(sf_dir)), with_gt=True)
    _stage_expectation(gdf, "synth_gt")
    return extract_documents(tdf).select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_words").cast("long").alias("n_words"),
    )


_SKEW_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, gt_text AS extracted_text,
       n_pages::BIGINT AS n_pages, n_words::BIGINT AS n_words
FROM read_parquet('{ORACLE_SCRATCH}/skew_gt/*.parquet')
"""


def ocr_extract_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-angle rotated pages: every payload page is skewed by a
    random fractional angle (+/-2..14 deg); straighten_pages estimates the
    skew (projection-profile search) and inverts the rotation losslessly
    (Paeth three-shear), so extraction must still be bit-exact."""
    from doctr_spark.fixtures.skew import generate_skewed_transcripts

    tdf, gdf = generate_skewed_transcripts(spark, 60, with_gt=True)
    _stage_expectation(gdf, "skew_gt")
    return extract_documents(tdf, straighten_pages=True).select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_words").cast("long").alias("n_words"),
    )


_RESAMPLE_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, true AS words_ok, true AS match_ok
FROM read_parquet('{ORACLE_SCRATCH}/resample_gt/*.parquet')
"""


def ocr_extract_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scanner-style robustness: pages rendered at 4x glyph scale, rotated
    by BILINEAR interpolation (not the engine's own lossless shear), then
    extracted under straighten_pages. The round trip cannot be bit-exact,
    so this is a TOLERANCE oracle: per turn, the detected word count must
    sit within max(1, 10%) of ground truth and the token-set recall must
    reach 0.9. The expectation (all-true rows) is staged to parquet."""
    from doctr_spark.fixtures.resample import generate_resampled_transcripts

    tdf, gdf = generate_resampled_transcripts(spark, 30, with_gt=True)
    _stage_expectation(gdf.select("conv_id", "turn_idx"), "resample_gt")
    docs = extract_documents(tdf, straighten_pages=True)
    gt = gdf.select(
        "conv_id",
        "turn_idx",
        F.col("n_words").alias("gt_n_words"),
        F.array_distinct(F.split(F.col("gt_text"), r"\s+")).alias("gt_toks"),
    )
    j = docs.join(gt, ["conv_id", "turn_idx"], "right")
    pred_toks = F.array_distinct(
        F.split(F.coalesce(F.col("extracted_text"), F.lit("")), r"\s+")
    )
    recall = F.size(F.array_intersect(pred_toks, F.col("gt_toks"))) / F.size("gt_toks")
    words_ok = (
        F.abs(F.coalesce(F.col("n_words"), F.lit(0)) - F.col("gt_n_words"))
        <= F.greatest(F.lit(1.0), F.round(F.col("gt_n_words") * 0.1))
    )
    return j.select(
        "conv_id",
        "turn_idx",
        words_ok.alias("words_ok"),
        (recall >= 0.9).alias("match_ok"),
    )


_RTL_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, gt_text AS extracted_text,
       n_pages::BIGINT AS n_pages, n_words::BIGINT AS n_words
FROM read_parquet('{ORACLE_SCRATCH}/rtl_gt/*.parquet')
"""


def ocr_extract_rtl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-left slice: Hebrew AND Arabic rows laid out right-to-left
    (with embedded LTR digit lines), recognized with the ``rtl`` working
    vocab (both consonant cores, reference `datasets/vocabs.py:228,480`)
    and rendered under ``text_direction="auto"`` — each line takes its own
    base direction from its text, so extraction must equal the
    generation-time LOGICAL word order."""
    from doctr_spark.fixtures.rtl import generate_rtl_transcripts

    tdf, gdf = generate_rtl_transcripts(spark, 40, with_gt=True)
    _stage_expectation(gdf, "rtl_gt")
    return extract_documents(tdf, reco_vocab="rtl", text_direction="auto").select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_words").cast("long").alias("n_words"),
    )


_MC_ORACLE = f"""
SELECT mode, conv_id, turn_idx::INT AS turn_idx, gt_text AS extracted_text,
       n_pages::BIGINT AS n_pages, n_words::BIGINT AS n_words
FROM read_parquet('{ORACLE_SCRATCH}/mc_gt/*.parquet')
"""


def ocr_extract_multicolumn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-aware reading order end to end, BOTH renders in one slot
    (the driver caps correctness rows at 50 queries): two-column pages
    with a bridging title, header/footer/footnote furniture, and a photo
    float with a hugging caption, extracted with
    ``keep_reading_order=True`` (the builder consumes the in-pipeline
    layout predictor's regions).

    * ``mode='layout'`` — the full render; the staged oracle is the
      generator's designed reading-order text — title, full left column,
      full right column — which the naive y-sorted builder would
      interleave.
    * ``mode='bare'`` — the ``include_furniture=False`` render (reference
      `doctr/io/exporters.py:346-347`): the extraction must drop exactly
      the page-header, footnote and footer blocks. Its oracle filters the
      full ground truth by the per-block roles the fixture emits
      (`gt_roles`, parallel to the blocks) — position-independent, so a
      fixture-layout change cannot silently shift which blocks count as
      furniture."""
    from doctr_spark.fixtures.multicolumn import (
        bare_gt_text,
        generate_multicolumn_transcripts,
    )

    tdf, gdf = generate_multicolumn_transcripts(spark, 40, with_gt=True)
    bare_text = bare_gt_text()
    gt = gdf.select(
        F.lit("layout").alias("mode"),
        "conv_id",
        "turn_idx",
        "gt_text",
        "n_pages",
        "n_words",
    ).unionByName(
        gdf.select(
            F.lit("bare").alias("mode"),
            "conv_id",
            "turn_idx",
            bare_text.alias("gt_text"),
            "n_pages",
            F.size(F.split(bare_text, r"\s+")).cast(gdf.schema["n_words"].dataType).alias("n_words"),
        )
    )
    _stage_expectation(gt, "mc_gt")
    full = extract_documents(tdf, keep_reading_order=True)
    bare = extract_documents(tdf, keep_reading_order=True, include_furniture=False)
    flat = F.coalesce(F.col("extracted_text"), F.lit(""))

    def _proj(df: DataFrame, mode: str, recount: bool) -> DataFrame:
        n = (
            F.size(F.split(flat, r"\s+")) if recount else F.col("n_words")
        )
        return df.select(
            F.lit(mode).alias("mode"),
            "conv_id",
            "turn_idx",
            "extracted_text",
            F.col("n_pages").cast("long").alias("n_pages"),
            n.cast("long").alias("n_words"),
        )

    return _proj(full, "layout", False).unionByName(_proj(bare, "bare", True))


_ACCENT_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, gt_text AS extracted_text,
       gt_ascii AS ascii_text, n_words::BIGINT AS n_words
FROM read_parquet('{ORACLE_SCRATCH}/accent_gt/*.parquet')
"""


def ocr_extract_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-ASCII corpus slice: Latin-1 accented words through the full
    pipeline (html + img payloads; img accents round-trip the glyph code
    space via the 120-char french vocab). ``ascii_text`` applies the NFD
    diacritic fold as a NATIVE translate expression whose char map is
    derived from `kernels.vocab.translate`; the oracle's ``gt_ascii`` was
    computed at generation time by the per-char NFD kernel itself, so the
    scale-path expression and the kernel are checked against each other."""
    from doctr_spark.fixtures.accents import generate_accented_transcripts
    from doctr_spark.kernels.vocab import ascii_fold_pairs

    tdf, gdf = generate_accented_transcripts(spark, 40, with_gt=True)
    _stage_expectation(gdf, "accent_gt")
    src, dst = ascii_fold_pairs()
    return extract_documents(tdf).select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.translate(F.col("extracted_text"), src, dst).alias("ascii_text"),
        F.col("n_words").cast("long").alias("n_words"),
    )


_MEDIA_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, page_idx::INT AS page_idx, media_kind,
       height::INT AS height, width::INT AS width, n_bytes::BIGINT AS n_bytes,
       ink_ratio::DOUBLE AS ink_ratio, feature_json
FROM read_parquet('{ORACLE_SCRATCH}/media_gt/*.parquet')
"""


def ocr_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary page column -> typed metadata + features.
    Oracle: generation-time expectation rows (pre-payload canvases)."""
    from doctr_spark.fixtures.transcripts import generate_transcripts

    tdf, mdf = generate_transcripts(spark, 50, with_media=True)
    _stage_expectation(mdf, "media_gt")
    return media_metadata(decode_pages(tdf))


_LOC_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, n_gt::BIGINT AS n_gt,
       n_pred::BIGINT AS n_pred, recall::DOUBLE AS recall,
       precision::DOUBLE AS precision, mean_iou::DOUBLE AS mean_iou
FROM read_parquet('{ORACLE_SCRATCH}/loc_gt/*.parquet')
"""


def metric_localization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCRMetric/LocalizationConfusion end to end: per-page Hungarian IoU
    matching (kernels.assignment.linear_sum_assignment) between detected
    boxes and generator ground truth. The fixture plants a deterministic
    count of faint words the DB preset must miss, so the staged expectation
    is ANALYTIC — recall = detectable/total, precision = 1, meanIoU = 1 —
    not a replay of the pipeline's own output."""
    from doctr_spark.fixtures.boxes import generate_boxed_transcripts
    from doctr_spark.operators.detect import detect_and_crop
    from doctr_spark.operators.metrics import localization_per_page

    tdf, gdf = generate_boxed_transcripts(spark, 30, with_gt=True)
    exp = gdf.select(
        "conv_id",
        "turn_idx",
        F.col("n_gt").cast("long").alias("n_gt"),
        F.col("n_detectable").cast("long").alias("n_pred"),
        F.round(F.col("n_detectable") / F.col("n_gt"), 6).alias("recall"),
        F.lit(1.0).alias("precision"),
        F.lit(1.0).alias("mean_iou"),
    )
    _stage_expectation(exp, "loc_gt")
    crops = detect_and_crop(decode_pages(tdf))
    preds = (
        crops.where(F.col("word_idx") >= 0)
        .groupBy("conv_id", "turn_idx")
        .agg(F.collect_list(F.array("xmin", "ymin", "xmax", "ymax")).alias("pred_boxes"))
    )
    pairs = gdf.join(preds, ["conv_id", "turn_idx"], "left").select(
        F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string")).alias("page_key"),
        "gt_boxes",
        F.coalesce(F.col("pred_boxes"), F.array().cast("array<array<double>>")).alias("pred_boxes"),
    )
    per_page = localization_per_page(pairs)
    return per_page.select(
        F.split_part(F.col("page_key"), F.lit("|"), F.lit(1)).alias("conv_id"),
        F.split_part(F.col("page_key"), F.lit("|"), F.lit(2)).cast("int").alias("turn_idx"),
        F.col("n_gt"),
        F.col("n_pred"),
        F.round(F.col("n_matched") / F.col("n_gt"), 6).alias("recall"),
        F.round(F.col("n_matched") / F.col("n_pred"), 6).alias("precision"),
        F.round(F.col("sum_iou") / F.col("n_matched"), 6).alias("mean_iou"),
    )


_ARTEFACT_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, page_idx::INT AS page_idx, label,
       xmin::INT AS xmin, ymin::INT AS ymin, xmax::INT AS xmax, ymax::INT AS ymax
FROM read_parquet('{ORACLE_SCRATCH}/artefact_gt/*.parquet')
"""


def ocr_artefacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Artefact side predictor (bar/QR/logo/photo) over artefact-bearing
    pages; oracle = the generator's drawn-artefact expectations."""
    from doctr_spark.fixtures.artefacts import generate_artefact_transcripts
    from doctr_spark.operators.multimodal import artefact_rows

    tdf, gdf = generate_artefact_transcripts(spark, 40, with_gt=True)
    _stage_expectation(gdf, "artefact_gt")
    return artefact_rows(decode_pages(tdf))


_DET_METRIC_ORACLE = f"""
SELECT page_key, n_gt::BIGINT AS n_gt, n_pred::BIGINT AS n_pred,
       n_matched::BIGINT AS n_matched, recall::DOUBLE AS recall,
       precision::DOUBLE AS precision, mean_iou::DOUBLE AS mean_iou
FROM read_parquet('{ORACLE_SCRATCH}/detmetric_gt/*.parquet')
"""


def metric_artefact_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DetectionMetric`` end to end (reference `doctr/utils/metrics.py:
    527-637`): class-aware Hungarian matching between the artefact side
    predictor's detections and the generator's ground truth. Odd pages
    deliberately swap ONE metric-GT label to a divergent class, so the
    staged expectation is analytic — recall = precision = (n-1)/n there,
    and mean IoU stays 1 (the detector's boxes are the drawn ink boxes)."""
    from doctr_spark.fixtures.artefacts import generate_artefact_transcripts
    from doctr_spark.operators.metrics import detection_metric_per_page
    from doctr_spark.operators.multimodal import artefact_rows

    tdf, gdf = generate_artefact_transcripts(spark, 40, with_gt=True)
    odd = F.col("conv_id").substr(-1, 1).cast("int") % 2 == 1

    def _group(df, box_cols, lbl):
        return df.groupBy("conv_id", "turn_idx", "page_idx").agg(
            F.collect_list(F.array(*[F.col(c).cast("double") for c in box_cols])).alias("boxes"),
            F.collect_list(lbl).alias("labels"),
        )

    # metric GT: swap the first artefact's label on odd conversations (a
    # deterministic annotation divergence the class check must catch)
    from pyspark.sql.window import Window

    gt_rows = gdf.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("conv_id", "turn_idx", "page_idx").orderBy("xmin", "ymin")
        ),
    ).withColumn(
        "metric_label",
        F.when(odd & (F.col("rn") == 1), F.concat(F.lit("not_"), F.col("label"))).otherwise(
            F.col("label")
        ),
    )
    gt = _group(gt_rows, ["xmin", "ymin", "xmax", "ymax"], F.col("metric_label")).select(
        "conv_id", "turn_idx", "page_idx",
        F.col("boxes").alias("gt_boxes"), F.col("labels").alias("gt_labels"),
    )

    n = F.size("gt_labels")
    swapped = F.when(odd, F.least(F.lit(1), n)).otherwise(F.lit(0))
    exp = gt.select(
        F.concat_ws("|", "conv_id", "turn_idx", "page_idx").alias("page_key"),
        n.cast("long").alias("n_gt"),
        n.cast("long").alias("n_pred"),
        (n - swapped).cast("long").alias("n_matched"),
        F.round((n - swapped) / n, 6).alias("recall"),
        F.round((n - swapped) / n, 6).alias("precision"),
        F.lit(1.0).alias("mean_iou"),
    )
    _stage_expectation(exp, "detmetric_gt")

    preds = _group(
        artefact_rows(decode_pages(tdf)), ["xmin", "ymin", "xmax", "ymax"], F.col("label")
    ).select(
        "conv_id", "turn_idx", "page_idx",
        F.col("boxes").alias("pred_boxes"), F.col("labels").alias("pred_labels"),
    )
    pairs = gt.join(preds, ["conv_id", "turn_idx", "page_idx"], "left").select(
        F.concat_ws("|", "conv_id", "turn_idx", "page_idx").alias("page_key"),
        "gt_boxes",
        "gt_labels",
        F.coalesce("pred_boxes", F.array().cast("array<array<double>>")).alias("pred_boxes"),
        F.coalesce("pred_labels", F.array().cast("array<string>")).alias("pred_labels"),
    )
    per = detection_metric_per_page(pairs)
    return per.select(
        "page_key",
        "n_gt",
        "n_pred",
        "n_matched",
        F.round(F.col("n_matched") / F.col("n_gt"), 6).alias("recall"),
        F.round(F.col("n_matched") / F.col("n_pred"), 6).alias("precision"),
        F.round(F.col("sum_best_iou") / F.col("n_pred"), 6).alias("mean_iou"),
    )


# Independent SQL implementation of the COCO 101-point AP: the fixture is
# DESIGNED so every pairwise IoU is exactly 0 or 1 (grid-disjoint boxes;
# true detections coincide with their GT box, false positives sit in a
# reserved band), which lets DuckDB skip geometry and compute the same
# greedy-match outcome, PR curve, interpolation and level fold as the
# engine's generic IoU-based operator. Scores are globally unique, so the
# score-descending sort is deterministic on both sides.
_MAP_ORACLE = """
WITH base AS (
  SELECT event_id, event_id % 20 AS img, event_id % 3 AS cls,
         (event_id % 5 = 0) AS fp, 1.0 - event_id/10000000.0 AS score
  FROM events WHERE event_id < 2000
),
grp AS (SELECT DISTINCT img, cls FROM base WHERE NOT fp),
totals AS (
  SELECT cls, count(*)::DOUBLE AS total_gt FROM (
    SELECT img, cls FROM base WHERE NOT fp
    UNION ALL SELECT img, cls FROM grp
  ) GROUP BY cls
),
ordered AS (
  SELECT cls, score, CASE WHEN fp THEN 0 ELSE 1 END AS tp,
         sum(CASE WHEN fp THEN 0 ELSE 1 END) OVER w AS tp_cum,
         row_number() OVER w AS k
  FROM base
  WINDOW w AS (PARTITION BY cls ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
),
pr AS (
  SELECT o.cls, o.score, o.tp_cum / t.total_gt AS recall,
         o.tp_cum::DOUBLE / o.k AS precision
  FROM ordered o JOIN totals t USING (cls)
),
interp AS (
  SELECT cls, recall,
         max(precision) OVER (PARTITION BY cls ORDER BY score DESC
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_interp,
         coalesce(lag(recall) OVER (PARTITION BY cls ORDER BY score DESC), -0.01) AS prev_recall
  FROM pr
),
ap AS (
  SELECT cls,
         sum(p_interp * greatest(0, floor(recall*100 + 1e-9)
                                    - floor(prev_recall*100 + 1e-9))) / 101.0 AS ap
  FROM interp GROUP BY cls
),
m AS (SELECT avg(ap) AS mean_ap FROM ap)
SELECT round(t.thresh, 2) AS iou_thresh, round(m.mean_ap, 6) AS mean_ap
FROM (SELECT unnest([0.50,0.55,0.60,0.65,0.70,0.75,0.80,0.85,0.90,0.95]) AS thresh) t, m
"""


def metric_object_detection_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ObjectDetectionMetric`` (COCO mAP@[.5:.95], reference
    `doctr/utils/metrics.py:638-884`) end to end over deterministic boxes
    derived from the events table: true detections coincide with their
    grid GT box, every fifth event is a false positive in a reserved
    band, and each (image, class) group carries one undetected GT. The
    engine runs the generic geometry path (per-image greedy IoU matching
    + window-function PR/AP, `operators.metrics.object_detection_map`);
    the oracle recomputes the identical curve in pure SQL using the
    designed 0/1 IoU structure."""
    from pyspark.sql.window import Window

    from doctr_spark.operators.metrics import object_detection_map

    from doctr_spark.io.sources import scan_parallel

    ev = scan_parallel(
        spark.read.parquet(f"{sf_dir}/events.parquet").where(F.col("event_id") < 2000)
    )
    base = ev.select(
        "event_id",
        (F.col("event_id") % 20).alias("img"),
        (F.col("event_id") % 3).alias("cls"),
        (F.col("event_id") % 5 == 0).alias("fp"),
        (1.0 - F.col("event_id") / 1e7).alias("score"),
    )
    w = Window.partitionBy("img", "cls").orderBy("event_id")
    tp_rows = base.where(~F.col("fp")).withColumn("j", F.row_number().over(w) - 1)
    tp_box = F.array(
        (F.col("j") % 10) * 0.09,
        F.col("cls") * 0.25 + F.floor(F.col("j") / 10) * 0.02,
        (F.col("j") % 10) * 0.09 + 0.05,
        F.col("cls") * 0.25 + F.floor(F.col("j") / 10) * 0.02 + 0.015,
    )
    fp_box = F.array(
        (F.col("event_id") % 90) / 100.0,
        F.lit(0.9),
        (F.col("event_id") % 90) / 100.0 + 0.05,
        F.lit(0.915),
    )
    preds = tp_rows.select("img", "cls", "score", tp_box.alias("box")).unionByName(
        base.where(F.col("fp")).select("img", "cls", "score", fp_box.alias("box"))
    )
    missed_box = F.array(
        F.lit(0.0), F.col("cls") * 0.25 + 0.12, F.lit(0.05), F.col("cls") * 0.25 + 0.135
    )
    gts = tp_rows.select("img", "cls", tp_box.alias("box")).unionByName(
        tp_rows.select("img", "cls").distinct().select("img", "cls", missed_box.alias("box"))
    )
    g = gts.groupBy("img").agg(
        F.collect_list("box").alias("gt_boxes"), F.collect_list("cls").alias("gt_labels")
    )
    p = preds.groupBy("img").agg(
        F.collect_list("box").alias("pred_boxes"),
        F.collect_list("cls").alias("pred_labels"),
        F.collect_list("score").alias("pred_scores"),
    )
    pairs = g.join(p, "img", "full").select(
        F.coalesce("gt_boxes", F.array().cast("array<array<double>>")).alias("gt_boxes"),
        F.coalesce("gt_labels", F.array().cast("array<bigint>")).alias("gt_labels"),
        F.coalesce("pred_boxes", F.array().cast("array<array<double>>")).alias("pred_boxes"),
        F.coalesce("pred_labels", F.array().cast("array<bigint>")).alias("pred_labels"),
        F.coalesce("pred_scores", F.array().cast("array<double>")).alias("pred_scores"),
    )
    return object_detection_map(pairs)


_REGION_ORACLE = f"""
SELECT conv_id, turn_idx::INT AS turn_idx, page_idx::INT AS page_idx, label,
       xmin::INT AS xmin, ymin::INT AS ymin, xmax::INT AS xmax, ymax::INT AS ymax
FROM read_parquet('{ORACLE_SCRATCH}/region_gt/*.parquet')
"""


def ocr_layout_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout class surface (LW-DETR stand-in): pages with drawn header /
    section-header / text / list-item / table / picture / footer bands;
    oracle = the generator's drawn-region expectations."""
    from doctr_spark.fixtures.regions import generate_region_transcripts
    from doctr_spark.operators.multimodal import layout_region_rows

    tdf, gdf = generate_region_transcripts(spark, 40, with_gt=True)
    _stage_expectation(gdf, "region_gt")
    return layout_region_rows(decode_pages(tdf))


_DATASET_ORACLE = f"""
SELECT dataset, img_path, n_words::BIGINT AS n_words, labels_cat, boxes_sig
FROM read_parquet('{ORACLE_SCRATCH}/dataset_gt/*.parquet')
"""


def dataset_loaders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset annotation loaders (FUNSD / CORD / SROIE formats) over
    fabricated miniature archives, parsed distributed with native JSON/CSV
    expressions (`doctr_spark/io/datasets.py`; reference loaders
    `doctr/datasets/{{funsd,cord,sroie}}.py`). The fabricators' own
    ground-truth rows are the staged oracle; boxes are flattened to an
    int signature string (driver canonicalization can't sort arrays)."""
    import shutil

    from doctr_spark.fixtures import archives
    from doctr_spark.io import datasets as dsets

    root = f"{ORACLE_SCRATCH}/.archives"
    fabs = {
        "funsd": (archives.fabricate_funsd, dsets.load_funsd),
        "cord": (archives.fabricate_cord, dsets.load_cord),
        "sroie": (archives.fabricate_sroie, dsets.load_sroie),
        "synthtext": (archives.fabricate_synthtext, dsets.load_synthtext),
        "iiit5k": (archives.fabricate_iiit5k, dsets.load_iiit5k),
        "svhn": (archives.fabricate_svhn, dsets.load_svhn),
    }
    exp_rows, outs = [], []
    for name, (fab, load) in fabs.items():
        # clear any stale archive from a prior run with different
        # parameters — the glob-based loaders would pick leftovers up
        shutil.rmtree(f"{root}/{name}", ignore_errors=True)
        expected = fab(f"{root}/{name}", n_imgs=6)
        for e in expected:
            exp_rows.append(
                (
                    name,
                    e["img_path"],
                    len(e["labels"]),
                    "|".join(e["labels"]),
                    ";".join(",".join(str(int(v)) for v in b) for b in e["boxes"]),
                )
            )
        df = load(spark, f"{root}/{name}")
        outs.append(
            df.select(
                F.lit(name).alias("dataset"),
                "img_path",
                F.size("labels").cast("long").alias("n_words"),
                F.array_join("labels", "|").alias("labels_cat"),
                F.array_join(
                    F.transform(
                        "boxes",
                        lambda b: F.array_join(
                            F.transform(b, lambda v: v.cast("int").cast("string")), ","
                        ),
                    ),
                    ";",
                ).alias("boxes_sig"),
            )
        )
    gdf = spark.createDataFrame(
        exp_rows, "dataset string, img_path string, n_words long, labels_cat string, boxes_sig string"
    )
    _stage_expectation(gdf, "dataset_gt")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows > 0."""
    return ocr_extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # OCR pipeline
        "ocr_extract_documents": ocr_extract_documents,
        "ocr_word_stats": ocr_word_stats,
        "ocr_extract_synthetic": ocr_extract_synthetic,
        "ocr_extract_pdf": ocr_extract_pdf,
        "ocr_extract_skewed": ocr_extract_skewed,
        "ocr_extract_accents": ocr_extract_accents,
        "ocr_extract_resampled": ocr_extract_resampled,
        "ocr_extract_multicolumn": ocr_extract_multicolumn,
        "ocr_extract_rtl": ocr_extract_rtl,
        "ocr_media_metadata": ocr_media_metadata,
        "ocr_artefacts": ocr_artefacts,
        "ocr_layout_regions": ocr_layout_regions,
        "kie_class_counts": kie_counts_documents,
        "kie_class_values": kie_values_documents,
        "export_formats": export_formats_documents,
        "export_roundtrip": export_roundtrip_documents,
        "export_synthesize_roundtrip": export_synthesize_roundtrip,
        "dataset_loaders": dataset_loaders,
        # dedup suite
        "dedup_exact": dedup.exact_dedup,
        "dedup_minhash": dedup.minhash_signatures,
        "dedup_minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "dedup_simhash": dedup.simhash,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_substring_spans": dedup.substring_spans,
        "dedup_decontaminate": dedup.decontaminate,
        # similarity search
        "similarity_cosine_topk": similarity.cosine_topk,
        "similarity_lsh_ann": similarity.lsh_bucket_ann,
        "similarity_ivf_ann": similarity.ivf_ann,
        "similarity_near_dup_clusters": similarity.near_dup_report,
        # text analysis
        "text_stats": text_analysis.text_stats,
        "text_lang_id": text_analysis.lang_id,
        "text_token_count": text_analysis.token_count_bpe,
        "text_fingerprint": text_analysis.fingerprint,
        "text_match_rates": text_analysis.match_rates,
        "text_quality_filter": text_analysis.quality_filter,
        "text_repetition": text_analysis.repetition_signals,
        "text_pack_sequences": text_analysis.pack_sequences,
        "text_pii_scrub": text_analysis.pii_scrub,
        "text_mix_sample": text_analysis.mix_sample,
        "text_source_stats": text_analysis.source_stats,
        "text_char_entropy": text_analysis.char_entropy,
        # metrics
        "metric_geometry_iou": _metric_geometry_iou,
        "metric_localization": metric_localization,
        "metric_table_cells": metric_table_cells,
        "metric_artefact_detection": metric_artefact_detection,
        "metric_object_detection_map": metric_object_detection_map,
        # relational / window
        "rel_aggregates": relational.aggregates,
        "rel_events_sessionize": relational.events_sessionize,
        "rel_topk": relational.topk,
    }
    return q


def oracle_sql() -> dict[str, str]:
    oracles: dict[str, str] = {
        "ocr_extract_documents": _FLAGSHIP_ORACLE,
        "ocr_word_stats": _WORD_STATS_ORACLE,
        "kie_class_counts": _KIE_ORACLE,
        "kie_class_values": _KIE_VALUES_ORACLE,
        "export_formats": _EXPORT_FMT_ORACLE,
        "export_roundtrip": _ROUNDTRIP_ORACLE,
        "export_synthesize_roundtrip": _SYNTH_RT_ORACLE,
        "ocr_extract_synthetic": _SYNTH_ORACLE,
        "ocr_extract_pdf": _PDF_ORACLE,
        "ocr_extract_skewed": _SKEW_ORACLE,
        "ocr_extract_accents": _ACCENT_ORACLE,
        "ocr_extract_resampled": _RESAMPLE_ORACLE,
        "ocr_extract_multicolumn": _MC_ORACLE,
        "ocr_extract_rtl": _RTL_ORACLE,
        "ocr_media_metadata": _MEDIA_ORACLE,
        "ocr_artefacts": _ARTEFACT_ORACLE,
        "ocr_layout_regions": _REGION_ORACLE,
        "dataset_loaders": _DATASET_ORACLE,
    }
    from doctr_spark.operators.metrics import GEOM_IOU_ORACLE

    oracles["metric_geometry_iou"] = GEOM_IOU_ORACLE
    oracles["metric_localization"] = _LOC_ORACLE
    oracles["metric_table_cells"] = _TABLE_CELL_ORACLE
    oracles["metric_artefact_detection"] = _DET_METRIC_ORACLE
    oracles["metric_object_detection_map"] = _MAP_ORACLE
    oracles.update(dedup.ORACLES)
    oracles.update(similarity.ORACLES)
    oracles.update(text_analysis.ORACLES)
    oracles.update(relational.ORACLES)
    return oracles
