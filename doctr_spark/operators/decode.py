"""Stage 1 — payload decode: transcript turns -> page-image rows.

Spark analogue of `DocumentFile.from_pdf/from_url/from_images`
(`/root/reference/doctr/io/reader.py`): a `mapInPandas` stage that parses
the turn's ``text`` payload (HTML -> DOM heuristics + layout engine, packed
img/pdf -> direct decode) and emits one row per page with the page bytes
compressed in a binary column.

The payload predicate is a native ``contains`` filter applied BEFORE the
UDF, so Catalyst pushes it (and the 3-column projection) into the scan —
prose-only turns never reach Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..fixtures.payloads import PAYLOAD_MARK, decode_payload
from ..kernels.imgcodec import encode_page

PAGES_SCHEMA = (
    "conv_id string, turn_idx int, page_idx int, page_h int, page_w int, page binary"
)
_COLS = ["conv_id", "turn_idx", "page_idx", "page_h", "page_w", "page"]


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
            # Corrupt payloads (bad base64 / truncated packing) are expected
            # at web scale: quarantine the turn instead of failing the job.
            # Quarantined turns surface as null extracted_text under
            # include_all_turns, identical to payload-free turns.
            try:
                pages = decode_payload(text)
            except NotImplementedError:
                raise  # disclosed env gates (%PDF raster) must fail loudly
            except Exception:
                continue
            for page_idx, img in enumerate(pages):
                rows.append(
                    (conv_id, int(turn_idx), page_idx, img.shape[0], img.shape[1], encode_page(img))
                )
        yield pd.DataFrame(rows, columns=_COLS)


def decode_pages(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(conv_id, turn_idx, ..., text, ...) -> one row per decoded page.

    The payload turns are explicitly hash-repartitioned before the UDF:
    payload text is tiny in bytes but minutes-per-MB in decode cost, so the
    scan's file-split parallelism (or an AQE-coalesced shuffle) is the wrong
    partitioning for this stage — without this, a small input collapses the
    whole decode onto a couple of tasks.
    """
    src = transcripts.where(F.col("text").contains(PAYLOAD_MARK)).select(
        "conv_id", "turn_idx", "text"
    )
    if num_partitions is None:
        num_partitions = transcripts.sparkSession.sparkContext.defaultParallelism * 2
    src = src.repartition(num_partitions, F.xxhash64("conv_id", "turn_idx"))
    return src.mapInPandas(_decode_batches, schema=PAGES_SCHEMA)
