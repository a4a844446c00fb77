"""The evaluate CLI flow (reference scripts/evaluate.py:23-188): archive of
real PNG pages + OCRDataset labels -> distributed read -> full extraction
-> TextMatch + Hungarian localization metrics."""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from doctr_spark.fixtures.archives import fabricate_ocr_rendered


def test_evaluate_rendered_archive_is_perfect(spark, tmp_path):
    from evaluate import evaluate

    root = str(tmp_path / "eval")
    expected = fabricate_ocr_rendered(root, n_imgs=5)
    # a corrupt stray PNG must be quarantined by decode, not crash the job,
    # and stays out of the metrics (no GT row)
    with open(f"{root}/images/broken.png", "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    got = evaluate(spark, f"{root}/images", f"{root}/labels.json")
    assert got["n_images"] == len(expected)
    assert got["exact_rate"] == 1.0
    assert got["caseless_rate"] == 1.0
    assert got["recall"] == 1.0
    assert got["precision"] == 1.0
    assert got["mean_iou"] == 1.0


def test_evaluate_counts_misses(spark, tmp_path):
    import json

    from evaluate import evaluate

    root = str(tmp_path / "eval2")
    fabricate_ocr_rendered(root, n_imgs=3)
    # claim an extra GT word nothing renders: recall must drop below 1
    labels = json.load(open(f"{root}/labels.json"))
    first = next(iter(labels))
    labels[first]["typed_words"].append({"geometry": [400.0, 100.0, 440.0, 116.0], "value": "ghost"})
    json.dump(labels, open(f"{root}/labels.json", "w"))
    got = evaluate(spark, f"{root}/images", f"{root}/labels.json")
    assert got["recall"] < 1.0
    assert got["precision"] == 1.0  # every prediction still matches a GT box
    assert got["exact_rate"] < 1.0  # the ghost word breaks that page's text
