"""Stage 3 — recognition: crop rows -> (value, confidence).

Spark analogue of `RecognitionPredictor.forward`
(`doctr/models/recognition/predictor/pytorch.py:44-85`): wide crops are
split into overlapping windows, each window goes through the model forward
+ CTC best-path decode, and the window predictions are merged back — all
inside the kernel, local to one crop, so no extra shuffle.

Before the UDF the crops are re-keyed onto a uniform hash partitioning:
detection's output partitioning follows *pages* (few, heavy rows), while
recognition wants *crops* (many, tiny rows) spread evenly — including the
crops of pathologically long conversations, which hash-on-full-key
de-skews (the salting policy from SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..kernels.imgcodec import decode_page
from ..kernels.recognition import recognize_crop

WORDS_SCHEMA = (
    "conv_id string, turn_idx int, page_idx int, page_h int, page_w int, "
    "word_idx int, xmin double, ymin double, xmax double, ymax double, "
    "score double, value string, confidence double"
)
_PASS = ["conv_id", "turn_idx", "page_idx", "page_h", "page_w",
         "word_idx", "xmin", "ymin", "xmax", "ymax", "score"]  # fmt: skip


def _recognize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        values, confs = [], []
        for blob in pdf["crop"]:
            if blob is None:  # empty-page sentinel passes through
                values.append(None)
                confs.append(0.0)
            else:
                v, c = recognize_crop(decode_page(bytes(blob)))
                values.append(v)
                confs.append(c)
        out = pdf[_PASS].copy()
        out["value"] = values
        out["confidence"] = confs
        yield out


def recognize(crops: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Recognize every crop; optionally rebalance onto ``num_partitions``."""
    if num_partitions:
        crops = crops.repartition(
            num_partitions, F.xxhash64("conv_id", "turn_idx", "page_idx", "word_idx")
        )
    return crops.mapInPandas(_recognize_batches, schema=WORDS_SCHEMA)
