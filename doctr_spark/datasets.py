"""Reference-parity import location for the dataset loaders.

The reference exposes its loaders as ``doctr.datasets``; a migrating user
finds the Spark equivalents here under the same names they know:

    from doctr_spark.datasets import load_funsd, load_cord, ...

Implementation lives in `doctr_spark.io.datasets` (distributed native
readers over the same on-disk annotation formats); the miniature-archive
fabricators used by its tests are `doctr_spark.fixtures.archives`.
"""

from .io.datasets import (  # noqa: F401
    CLASS_NAME,
    load_coco_text,
    load_cord,
    load_detection_dataset,
    load_funsd,
    load_ic13,
    load_iiit5k,
    load_imgur5k,
    load_mjsynth,
    load_ocr_dataset,
    load_recognition_dataset,
    load_sroie,
    load_svhn,
    load_svt,
    load_synthtext,
    load_wildreceipt,
)

__all__ = [
    "CLASS_NAME",
    "load_coco_text",
    "load_cord",
    "load_detection_dataset",
    "load_funsd",
    "load_ic13",
    "load_iiit5k",
    "load_imgur5k",
    "load_mjsynth",
    "load_ocr_dataset",
    "load_recognition_dataset",
    "load_sroie",
    "load_svhn",
    "load_svt",
    "load_synthtext",
    "load_wildreceipt",
]
