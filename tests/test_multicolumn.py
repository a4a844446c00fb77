"""Multi-column layout-aware reading order, kernel level and end to end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from doctr_spark.fixtures.multicolumn import (
    FURNITURE_BLOCK_ROLES,
    bare_gt_text,
    gen_multicolumn_page,
    generate_multicolumn_transcripts,
)
from doctr_spark.kernels.builder import build_page
from doctr_spark.kernels.detection import detect_words, extract_crops
from doctr_spark.kernels.layout import detect_layout_regions
from doctr_spark.kernels.recognition import recognize_crops_batched
from doctr_spark.operators.pipeline import extract_documents


def _detect_recognize(canvas):
    abs_boxes, rel_boxes, scores = detect_words(canvas)
    vals = recognize_crops_batched(extract_crops(canvas, abs_boxes))
    keep = [i for i, (v, _) in enumerate(vals) if v != ""]
    return (
        rel_boxes[keep],
        scores[keep],
        [vals[i][0] for i in keep],
        [vals[i][1] for i in keep],
    )


@pytest.mark.parametrize("conv_no", [0, 7, 31])
def test_multicolumn_page_kernel_roundtrip(conv_no):
    rng = np.random.default_rng([42, conv_no, 23])
    canvas, gt, n_words, roles = gen_multicolumn_page(rng)
    regions = detect_layout_regions(canvas)
    # the detector must find every furniture class the fixture draws
    assert {"page_header", "title", "picture", "caption", "footnote", "page_footer"} <= set(
        regions["class_names"]
    )
    boxes, scores, values, confs = _detect_recognize(canvas)
    assert len(values) == n_words  # the photo float must contribute no words
    page = build_page(
        boxes,
        scores,
        values,
        confs,
        canvas.shape,
        keep_reading_order=True,
        layout_regions={"boxes": regions["boxes"].tolist(), "class_names": regions["class_names"]},
    )
    assert page["text"] == gt


def test_multicolumn_naive_order_differs():
    """The staged GT is genuinely reading-ordered: the default y-sorted
    builder interleaves the column rows and must NOT match it."""
    rng = np.random.default_rng([42, 0, 23])
    canvas, gt, _, _ = gen_multicolumn_page(rng)
    boxes, scores, values, confs = _detect_recognize(canvas)
    naive = build_page(boxes, scores, values, confs, canvas.shape)
    assert naive["text"] != gt


def test_multicolumn_pipeline_end_to_end(spark):
    tdf, gdf = generate_multicolumn_transcripts(spark, 4, with_gt=True)
    docs = extract_documents(tdf, keep_reading_order=True, crop_partitions=8)
    gt = gdf.withColumnRenamed("n_words", "gt_n_words")
    j = (
        docs.join(gt, ["conv_id", "turn_idx"])
        .select(
            (F.col("extracted_text") == F.col("gt_text")).alias("text_ok"),
            (F.col("n_words") == F.col("gt_n_words")).alias("words_ok"),
        )
        .collect()
    )
    assert len(j) >= 4
    assert all(r.text_ok and r.words_ok for r in j)


def test_include_furniture_filters_render():
    """`include_furniture=False` drops header/footnote/footer blocks from
    the render (reference doctr/io/exporters.py:346-347) while the JSON
    export keeps every block."""
    from doctr_spark.kernels.exporters import export_markdown, export_text

    rng = np.random.default_rng([42, 3, 23])
    canvas, gt, _, roles = gen_multicolumn_page(rng)
    regions = detect_layout_regions(canvas)
    boxes, scores, values, confs = _detect_recognize(canvas)
    layout = {"boxes": regions["boxes"].tolist(), "class_names": regions["class_names"]}
    full = build_page(boxes, scores, values, confs, canvas.shape,
                      keep_reading_order=True, layout_regions=layout)
    bare = build_page(boxes, scores, values, confs, canvas.shape,
                      keep_reading_order=True, layout_regions=layout, include_furniture=False)
    blocks = gt.split("\n\n")
    assert len(blocks) == len(roles)
    expected_bare = "\n\n".join(
        b for b, r in zip(blocks, roles) if r not in FURNITURE_BLOCK_ROLES
    )
    assert full["text"] == gt
    assert bare["text"] == expected_bare
    assert len(bare["blocks"]) == len(full["blocks"]) == 9  # JSON keeps all
    assert export_text(full) == gt
    assert export_text(full, include_furniture=False) == bare["text"]
    md = export_markdown(full, include_furniture=False)
    assert blocks[0].split(" ")[0] not in md and blocks[2].split(" ")[0] in md


def test_bare_gt_role_filter_survives_layout_change(spark):
    """VERDICT r4 #3: the bare-render oracle must be driven by block roles,
    not positions. Splice an extra body block into the middle of the GT (a
    simulated fixture-layout change) and check the staged-oracle expression
    still drops exactly the furniture blocks."""
    rng = np.random.default_rng([42, 5, 23])
    _, gt, _, roles = gen_multicolumn_page(rng)
    blocks = gt.split("\n\n")
    # insert a new body block right after the page header (shifts every
    # downstream position by one — the old slice(2, 6) oracle would now
    # keep the header's neighbor and lose the caption)
    blocks.insert(1, "inserted body block")
    roles.insert(1, "column")
    df = spark.createDataFrame(
        [("\n\n".join(blocks), ",".join(roles))], "gt_text string, gt_roles string"
    )
    got = df.select(bare_gt_text().alias("bare")).first().bare
    expected = "\n\n".join(
        b for b, r in zip(blocks, roles) if r not in FURNITURE_BLOCK_ROLES
    )
    assert got == expected
    assert "inserted body block" in got
    for b, r in zip(blocks, roles):
        assert (b in got) == (r not in FURNITURE_BLOCK_ROLES)
