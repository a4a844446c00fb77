import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: N812

from doctr_spark.fixtures.transcripts import generate_transcripts
from doctr_spark.zoo import kie_predictor, ocr_predictor


def test_factory_validation():
    with pytest.raises(ValueError):
        ocr_predictor(det_arch="nope")
    with pytest.raises(ValueError):
        ocr_predictor(reco_arch="nope")


def test_attention_arch_matches_ctc(spark):
    tdf, gdf = generate_transcripts(spark, 8, with_gt=True)
    for arch in ("ctc", "attention"):
        predictor = ocr_predictor(reco_arch=arch, crop_partitions=4)
        docs = predictor(tdf)
        j = docs.join(gdf.select("conv_id", "turn_idx", "gt_text"), ["conv_id", "turn_idx"])
        n, match = j.select(
            F.count("*"), F.sum((F.col("extracted_text") == F.col("gt_text")).cast("int"))
        ).first()
        assert n > 0 and match == n, arch


def test_add_hook_and_kie_factory(spark):
    tdf = generate_transcripts(spark, 6)
    predictor = ocr_predictor(crop_partitions=4)
    calls = []

    def hook(crops):
        calls.append(1)
        return crops

    predictor.add_hook(hook)
    assert predictor(tdf).count() > 0
    assert calls  # hook participated in plan construction

    kie = kie_predictor(crop_partitions=4)
    assert kie(tdf).count() > 0


def test_asciidoc_exporter():
    from doctr_spark.kernels.builder import build_page
    from doctr_spark.kernels.exporters import export_asciidoc

    boxes = np.array([[0.05, 0.1, 0.15, 0.16], [0.17, 0.1, 0.25, 0.16]])
    page = build_page(boxes, np.array([0.8, 0.8]), ["*bold", "x_y"], [0.9, 0.9], (256, 512))
    page.pop("text")
    adoc = export_asciidoc(page)
    # '*' is escaped, so the line no longer starts with a marker char and
    # needs no {empty} neutralization (matches the reference order of ops)
    assert adoc == "\\*bold x\\_y"
    page2 = build_page(
        np.array([[0.05, 0.1, 0.15, 0.16]]), np.array([0.8]), ["-dash"], [0.9], (256, 512)
    )
    page2.pop("text")
    assert export_asciidoc(page2) == "{empty}-dash"
