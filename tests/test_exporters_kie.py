import json

import numpy as np
import pytest

from doctr_spark.kernels.builder import build_page
from doctr_spark.kernels.exporters import export_hocr, export_html, export_markdown, export_text
from doctr_spark.kernels.kie import classify_token, kie_build_page, render_kie_page


@pytest.fixture()
def page():
    boxes = np.array([
        [0.05, 0.1, 0.15, 0.16],
        [0.17, 0.1, 0.25, 0.16],
        [0.05, 0.2, 0.15, 0.26],
    ])
    p = build_page(boxes, np.array([0.8] * 3), ["-hello", "world", "42"], [0.9] * 3, (256, 512))
    p.pop("text")
    return json.loads(json.dumps(p))  # simulate the page_json roundtrip


def test_export_text(page):
    assert export_text(page) == "-hello world\n42"


def test_export_markdown_escapes_and_neutralizes(page):
    md = export_markdown(page)
    # leading '-' would start a list -> neutralized; '.'/'#' chars escaped
    assert md.splitlines()[0].startswith("\\-hello")
    assert "42" in md


def test_export_html(page):
    html = export_html(page)
    assert html == "<p>-hello world<br>42</p>"


def test_export_hocr_bboxes(page):
    hocr = export_hocr(page)
    assert "ocr_page" in hocr and "ocrx_word" in hocr
    # first word bbox: rel (0.05,0.1,0.15,0.16) on 512x256 page
    assert "bbox 26 26 77 41" in hocr  # round(0.05*512)=26, round(0.1*256)=26...
    assert "x_wconf 90" in hocr


def test_classify_token():
    assert classify_token("1234") == "number"
    assert classify_token("abc") == "alpha"
    assert classify_token("a1") == "mixed"


def test_kie_build_page_reading_order_per_class():
    boxes = np.array([
        [0.5, 0.1, 0.6, 0.16],  # word "99" row 1 right
        [0.1, 0.1, 0.2, 0.16],  # word "abc" row 1 left
        [0.1, 0.3, 0.2, 0.36],  # word "7" row 2
    ])
    page = kie_build_page(boxes, np.array([0.8] * 3), ["99", "abc", "7"], [0.9] * 3, (256, 512))
    assert list(page["predictions"]["number"][0]["geometry"]) == [0.5, 0.1, 0.6, 0.16]
    assert [p["value"] for p in page["predictions"]["number"]] == ["99", "7"]
    assert [p["value"] for p in page["predictions"]["alpha"]] == ["abc"]
    assert render_kie_page(page) == "alpha: abc\nnumber: 99 7"


def test_kie_empty_page():
    page = kie_build_page(np.zeros((0, 4)), np.zeros(0), [], [], (256, 512))
    assert page["predictions"] == {}
    assert render_kie_page(page) == ""
