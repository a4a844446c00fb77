"""The full extraction pipeline: the Spark analogue of
`OCRPredictor.forward` + `Document.render()`
(`/root/reference/doctr/models/predictor/pytorch.py:90-206`,
`/root/reference/doctr/io/exporters.py:416-433`).

Physical plan (two heavyweight Arrow stages separated by a keyed shuffle,
one bounded groupBy, one native aggregation):

    scan transcripts
      -> filter contains('<doc:')  [pushed to scan] + project 3 cols
      -> mapInPandas decode        (turns -> pages, ~KBs/row compressed)
      -> mapInPandas detect+crop   (pages -> crops, fused: page bytes read once)
      -> repartition xxhash64(full key)   [de-skews long conversations]
      -> mapInPandas recognize     (crops -> words)
      -> groupBy (conv,turn,page) applyInPandas build   [bounded groups]
      -> groupBy (conv,turn) native collect/sort/concat_ws
      [-> optional left join back to all turns]
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from .build import assemble_documents, build_pages
from .decode import decode_pages
from .detect import detect_and_crop
from .recognize import recognize


def extract_documents(
    transcripts: DataFrame,
    crop_partitions: int | None = None,
    include_all_turns: bool = False,
    resolve_lines: bool = True,
    resolve_blocks: bool = False,
    paragraph_break: float = 0.035,
    detect_crop_orientation: bool = True,
    keep_reading_order: bool = False,
    mask_region_labels: tuple[str, ...] | None = None,
    straighten_pages: bool = False,
    loc_hooks: Sequence[Callable[[DataFrame], DataFrame]] | None = None,
    reco_arch: str = "ctc",
    reco_vocab: str = "french",
    det_arch: str = "db_like",
    text_direction: str | None = None,
    include_furniture: bool = True,
    det_input_size: tuple[int, int] | None = None,
    det_preserve_aspect_ratio: bool = True,
    det_symmetric_pad: bool = True,
) -> DataFrame:
    """Run the detection->recognition->reconstruction pipeline.

    Returns one row per payload-bearing turn:
    ``(conv_id, turn_idx, extracted_text, n_pages, n_words, pages_json)``,
    or one row per input turn (nulls for prose turns) when
    ``include_all_turns``.

    ``loc_hooks`` is the Spark analogue of `OCRPredictor.add_hook`
    (`doctr/models/predictor/base.py:310-316`): DataFrame -> DataFrame
    transforms applied to the localization/crop rows between detection and
    recognition (e.g. filtering or rewriting boxes). Word sentinel rows
    (word_idx < 0) must be passed through.
    """
    if crop_partitions is None:
        sc = transcripts.sparkSession.sparkContext
        crop_partitions = sc.defaultParallelism * 2

    pages = decode_pages(transcripts)
    crops = detect_and_crop(
        pages,
        mask_region_labels=mask_region_labels,
        straighten_pages=straighten_pages,
        det_arch=det_arch,
        # reading order is layout-aware: the builder needs the layout
        # predictor's (label, box) regions to rank roles + attach captions
        carry_layout=keep_reading_order,
        # optional PreProcessor letterbox (fixed model input size with
        # aspect-preserving resize + symmetric pad) before detection
        det_input_size=det_input_size,
        det_preserve_aspect_ratio=det_preserve_aspect_ratio,
        det_symmetric_pad=det_symmetric_pad,
    )
    for hook in loc_hooks or ():
        crops = hook(crops)
    words = recognize(
        crops,
        num_partitions=crop_partitions,
        detect_orientation=detect_crop_orientation,
        arch=reco_arch,
        vocab=reco_vocab,
    )
    built = build_pages(
        words,
        resolve_lines=resolve_lines,
        resolve_blocks=resolve_blocks,
        paragraph_break=paragraph_break,
        keep_reading_order=keep_reading_order,
        text_direction=text_direction,
        include_furniture=include_furniture,
    )
    docs = assemble_documents(built)

    if include_all_turns:
        keys = transcripts.select("conv_id", "turn_idx")
        docs = keys.join(docs, on=["conv_id", "turn_idx"], how="left")
    return docs


def ordered(docs: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx) output ordering — the north-rule invariant
    is defined under this window ordering."""
    return docs.orderBy("conv_id", "turn_idx")
