"""Harness-hygiene guarantees (VERDICT r4 item 6): stale archive scratch is
cleared per dataset, the evaluate CLI survives a relative img_folder, and
the returned-persisted pair-list contract has an explicit release path."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_dataset_loaders_clears_stale_archives(spark):
    """A leftover annotation from a prior run with different parameters must
    not leak into the loaded rows: dataset_loaders rmtrees each dataset's
    scratch before fabricating."""
    import __spark_entry__ as entry

    base = f"{entry.ORACLE_SCRATCH}/.archives/funsd/dataset/training_data"
    os.makedirs(f"{base}/annotations", exist_ok=True)
    os.makedirs(f"{base}/images", exist_ok=True)
    # plant a stale annotated image that the glob-based loader WOULD pick up
    stale = {"form": [{"text": "stale", "box": [0, 0, 9, 9], "label": "other", "id": 0,
                       "words": [{"text": "stalely", "box": [1, 1, 8, 8]}]}]}
    with open(f"{base}/annotations/zzz_stale.json", "w") as f:
        json.dump(stale, f)
    open(f"{base}/images/zzz_stale.png", "wb").close()

    df = entry.dataset_loaders(spark, SF)
    rows = df.collect()
    assert len(rows) == 36  # 6 datasets x 6 fabricated images, no stragglers
    assert not any("zzz_stale" in r.img_path for r in rows)
    assert not any("stalely" in r.labels_cat for r in rows)


def test_evaluate_accepts_relative_img_folder(spark, tmp_path, monkeypatch):
    """The metrics join keys absolute binaryFile paths against the label
    table's img_path; a relative img_folder must be normalized, not
    silently miss every join (null metrics)."""
    from doctr_spark.fixtures.archives import fabricate_ocr_rendered
    from tools.evaluate import evaluate

    root = tmp_path / "ds"
    fabricate_ocr_rendered(str(root), n_imgs=3)
    monkeypatch.chdir(tmp_path)
    out = evaluate(spark, "ds/images", str(root / "labels.json"))
    assert out["n_images"] == 3
    for k in ("exact_rate", "caseless_rate", "recall", "precision", "mean_iou"):
        assert out[k] is not None and out[k] == pytest.approx(1.0, abs=0.2)


def test_consumed_releases_pair_list_cache(spark):
    """Pair-list operators return an eagerly persisted DataFrame (the
    documented contract); `operators.caching.consumed` is the explicit
    unpersist-after-consumption path for direct callers."""
    from doctr_spark.operators import dedup
    from doctr_spark.operators.caching import consumed

    pairs = dedup.minhash_lsh_pairs(spark, SF)
    assert pairs.storageLevel.useMemory  # returned persisted
    with consumed(pairs) as df:
        assert df.count() >= 0
    assert not pairs.storageLevel.useMemory

    # release happens even when the consumer raises
    again = dedup.minhash_lsh_pairs(spark, SF)
    with pytest.raises(RuntimeError, match="boom"):
        with consumed(again):
            raise RuntimeError("boom")
    assert not again.storageLevel.useMemory
