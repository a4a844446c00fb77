"""Predictor factory — API parity with the reference zoo
(`/root/reference/doctr/models/zoo.py:100-181` ocr_predictor,
`:250-325` kie_predictor).

Returns a callable `predictor(transcripts_df) -> DataFrame` wired with the
selected options, mirroring the reference constructor surface:

    >>> from doctr_spark.zoo import ocr_predictor
    >>> predictor = ocr_predictor(reco_arch="ctc", detect_language=False,
    ...                           straighten_pages=False)
    >>> docs = predictor(transcripts_df)

The det/reco "architectures" select the deterministic kernel variants
(both heads share the glyph forward; `ctc` collapses best-path with blank
frames, `attention` cuts at <eos> — the CRNN vs ViTSTR decode semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

DET_ARCHS = ("db_like", "fast_like", "linknet_like")  # threshold presets (kernels.detection.DET_PRESETS)
RECO_ARCHS = ("ctc", "attention")


@dataclass
class OCRPredictor:
    """Configured extraction pipeline (the `OCRPredictor` analogue)."""

    det_arch: str = "db_like"
    reco_arch: str = "ctc"
    resolve_lines: bool = True
    resolve_blocks: bool = False
    paragraph_break: float = 0.035
    detect_crop_orientation: bool = True
    straighten_pages: bool = False
    keep_reading_order: bool = False
    text_direction: str | None = None
    mask_region_labels: tuple[str, ...] | None = None
    crop_partitions: int | None = None
    include_all_turns: bool = False
    include_furniture: bool = True
    reco_vocab: str = "french"
    # PreProcessor parity (reference zoo.py preserve_aspect_ratio /
    # symmetric_pad kwargs + the det arch's fixed input shape)
    det_input_size: tuple[int, int] | None = None
    preserve_aspect_ratio: bool = True
    symmetric_pad: bool = True
    hooks: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.det_arch not in DET_ARCHS:
            raise ValueError(f"det_arch must be one of {DET_ARCHS}")
        if self.reco_arch not in RECO_ARCHS:
            raise ValueError(f"reco_arch must be one of {RECO_ARCHS}")

    def add_hook(self, hook: Callable[[DataFrame], DataFrame]) -> None:
        """Register a crop-level transform applied between detection and
        recognition (`doctr/models/predictor/base.py:310-316`)."""
        self.hooks.append(hook)

    def __call__(self, transcripts: DataFrame) -> DataFrame:
        from .operators.pipeline import extract_documents

        return extract_documents(
            transcripts,
            crop_partitions=self.crop_partitions,
            include_all_turns=self.include_all_turns,
            resolve_lines=self.resolve_lines,
            resolve_blocks=self.resolve_blocks,
            paragraph_break=self.paragraph_break,
            detect_crop_orientation=self.detect_crop_orientation,
            keep_reading_order=self.keep_reading_order,
            mask_region_labels=self.mask_region_labels,
            straighten_pages=self.straighten_pages,
            loc_hooks=self.hooks,
            reco_arch=self.reco_arch,
            reco_vocab=self.reco_vocab,
            det_arch=self.det_arch,
            text_direction=self.text_direction,
            include_furniture=self.include_furniture,
            det_input_size=self.det_input_size,
            det_preserve_aspect_ratio=self.preserve_aspect_ratio,
            det_symmetric_pad=self.symmetric_pad,
        )


def ocr_predictor(det_arch: str = "db_like", reco_arch: str = "ctc", **kwargs) -> OCRPredictor:
    return OCRPredictor(det_arch=det_arch, reco_arch=reco_arch, **kwargs)


def kie_predictor(crop_partitions: int | None = None) -> Callable[[DataFrame], DataFrame]:
    """KIE variant (`kie_predictor`, zoo.py:250-325): per-class prediction
    pages instead of Line/Block nesting."""
    from .operators.kie import kie_extract

    def predictor(transcripts: DataFrame) -> DataFrame:
        return kie_extract(transcripts, crop_partitions=crop_partitions)

    return predictor
