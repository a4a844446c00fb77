"""From-scratch PDF text codec (kernels/pdf.py): roundtrip, escapes,
filters, loud gates, and the real-%PDF extraction path end to end."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from doctr_spark.kernels.pdf import parse_pdf, rasterize_pdf, write_pdf

_word = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=10
)


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 200), st.integers(0, 100), _word
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    ),
    st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_pdf_roundtrip_property(pages, compress):
    """write -> parse restores every page's placements exactly, including
    the ()\\ escapes, for raw and FlateDecode streams."""
    data = write_pdf(pages, (160, 320), compress=compress)
    assert data[:5] == b"%PDF-" and data.rstrip().endswith(b"%%EOF")
    parsed = parse_pdf(data)
    assert len(parsed) == len(pages)
    for page, exp in zip(parsed, pages):
        assert page["size"] == (160, 320)
        got = [(int(x), int(y), t) for x, y, t, _sz in page["words"]]
        assert got == [(x, y, t) for x, y, t in exp]


def test_pdf_td_relative_positioning():
    """Td displaces relative to the current text position (spec 9.4.2)."""
    content = b"BT 1 0 0 1 10 50 Tm (a) Tj 20 -10 Td (b) Tj 5 0 Td (c) Tj ET"
    # splice our hand-written stream into the empty page's content object
    raw = write_pdf([[]], (100, 100))
    empty = b"BT /F1 12 Tf\nET"
    doc = raw.replace(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(empty), empty),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    )
    assert doc != raw, "fixture splice failed"
    (page,) = parse_pdf(doc)
    assert [(int(a), int(b), c) for a, b, c, _sz in page["words"]] == [
        (10, 100 - 50 - 16, "a"),
        (30, 100 - 40 - 16, "b"),
        (35, 100 - 40 - 16, "c"),
    ]



def test_pdf_loud_gates():
    data = write_pdf([[(1, 1, "w")]], (50, 80))
    with pytest.raises(NotImplementedError, match="Encrypt|encrypted"):
        parse_pdf(data.replace(b"/Root", b"/Encrypt 9 0 R /Root"))
    bad_filter = data.replace(b"/FlateDecode", b"/LZWDecode")
    if b"/LZWDecode" in bad_filter:
        with pytest.raises(NotImplementedError, match="LZWDecode"):
            parse_pdf(bad_filter)
    with pytest.raises(ValueError):
        parse_pdf(b"not a pdf")


def test_pdf_indirect_length_rejected():
    """'/Length 10 0 R' (indirect length) must reject loudly — the anchored
    regex must not backtrack to match '1' as a literal length."""
    data = write_pdf([[(1, 1, "hello world")]], (50, 80))
    import re as _re

    m = _re.search(rb"/Length (\d+)", data)
    doc = data[: m.start()] + b"/Length 10 0 R" + data[m.end() :]
    with pytest.raises(NotImplementedError, match="literal /Length"):
        parse_pdf(doc)


def test_pdf_array_filter_rejected():
    """'/Filter [/FlateDecode]' (array form) must reject loudly, not be
    silently treated as an unfiltered stream."""
    data = write_pdf([[(1, 1, "w")]], (50, 80), compress=True)
    doc = data.replace(b"/Filter /FlateDecode", b"/Filter [/FlateDecode]")
    assert doc != data, "fixture splice failed"
    with pytest.raises(NotImplementedError, match="array-valued /Filter"):
        parse_pdf(doc)


def test_pdf_truncated_stream_errors_not_hangs():
    """A stream object whose endobj was cut off must raise, not loop."""
    data = write_pdf([[(1, 1, "w")]], (50, 80))
    cut = data[: data.find(b"endobj")]  # drop everything from first endobj
    with pytest.raises((ValueError, NotImplementedError, KeyError)):
        parse_pdf(cut)


def test_pdf_rasterize_words_redetectable():
    from doctr_spark.kernels.detection import detect_words, extract_crops
    from doctr_spark.kernels.recognition import recognize_crops_batched

    data = write_pdf(
        [[(12, 10, "alpha"), (120, 10, "beta"), (12, 48, "gamma7")]], (100, 260),
        compress=True,
    )
    (canvas,) = rasterize_pdf(data)
    boxes, _, _ = detect_words(canvas)
    vals = recognize_crops_batched(extract_crops(canvas, boxes))
    assert sorted(v for v, _ in vals) == ["alpha", "beta", "gamma7"]


def test_pdf_extraction_end_to_end(spark):
    from doctr_spark.fixtures.pdfdocs import generate_pdf_transcripts
    from doctr_spark.operators.pipeline import extract_documents

    tdf, gdf = generate_pdf_transcripts(spark, 6, with_gt=True)
    docs = extract_documents(tdf, crop_partitions=8)
    gt = gdf.withColumnRenamed("n_words", "gt_n_words")
    rows = (
        docs.join(gt, ["conv_id", "turn_idx"])
        .select(
            (F.col("extracted_text") == F.col("gt_text")).alias("text_ok"),
            (F.col("n_words") == F.col("gt_n_words")).alias("words_ok"),
        )
        .collect()
    )
    assert len(rows) >= 6
    assert all(r.text_ok and r.words_ok for r in rows)


PAGE = [[(12, 10, "alpha"), (60, 10, "beta"), (12, 48, "gamma7")]]


def _placements(doc):
    (page,) = parse_pdf(doc)
    return sorted((round(x), round(y), t) for x, y, t, _sz in page["words"])


def test_pdf_tj_array_kerning_roundtrip():
    """[…] TJ with kerning numbers places every word exactly where the
    per-word Tm form does (§9.4.3 displacement math)."""
    classic = write_pdf(PAGE, (100, 260))
    tj = write_pdf(PAGE, (100, 260), use_tj=True)
    assert b"TJ" in tj and b"Tj" not in tj.replace(b"TJ", b"")
    assert _placements(tj) == _placements(classic)


def test_pdf_ascii_hex_filter():
    doc = write_pdf(PAGE, (100, 260), ascii_hex=True)
    assert b"/ASCIIHexDecode" in doc
    assert _placements(doc) == _placements(write_pdf(PAGE, (100, 260)))


def test_pdf15_object_and_xref_streams():
    """PDF 1.5: dict objects inside /ObjStm, xref as a stream, /Root only
    in the xref stream dict — parses identically to the classic layout."""
    doc = write_pdf(PAGE, (100, 260), use_tj=True, pdf15=True)
    assert doc.startswith(b"%PDF-1.5") and b"/ObjStm" in doc and b"/XRef" in doc
    assert b"trailer" not in doc and b"\nxref\n" not in doc
    assert _placements(doc) == _placements(write_pdf(PAGE, (100, 260)))


def test_pdf_tf_scale_parses_and_rasterizes():
    """Font size 24 = glyph scale 2: placements honor the scaled glyph
    height and the drawn page redetects through the crop normalizer."""
    from doctr_spark.kernels.detection import detect_words, extract_crops
    from doctr_spark.kernels.recognition import recognize_crops_batched

    page = [[(12, 10, "alpha"), (120, 10, "beta")]]
    doc = write_pdf(page, (120, 300), font_size=24)
    (parsed,) = parse_pdf(doc)
    assert [(round(x), round(y), t, sz) for x, y, t, sz in parsed["words"]] == [
        (12, 10, "alpha", 24.0),
        (120, 10, "beta", 24.0),
    ]
    (canvas,) = rasterize_pdf(doc)
    boxes, _, _ = detect_words(canvas)
    vals = recognize_crops_batched(extract_crops(canvas, boxes))
    assert sorted(v for v, _ in vals) == ["alpha", "beta"]


def test_pdf_fractional_scale_rejected():
    doc = write_pdf(PAGE, (100, 260))
    bad = doc.replace(b"/F1 12 Tf", b"/F1 13 Tf")
    assert bad != doc
    with pytest.raises(NotImplementedError, match="glyph scale"):
        rasterize_pdf(bad)
