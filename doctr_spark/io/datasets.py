"""Dataset annotation loaders as distributed Spark readers.

The reference ships one Python class per public OCR dataset that walks the
extracted archive on a single machine, parses per-image annotation files,
and yields (image, target) pairs (`doctr/datasets/funsd.py:1-124`,
`cord.py:1-133`, `sroie.py:1-113`, `detection.py:1-100`,
`recognition.py:1-57`, `ocr.py:1-71`). Here each loader is a DataFrame
reader over the same on-disk annotation formats: annotation parsing runs
distributed (`spark.read.json` / wholetext + `from_json`, all native
expressions — no Python UDFs), images stay referenced by path so a
1000-executor job can join them lazily against an image store instead of
materializing pixels through the driver.

Every loader returns one row per image:

    img_path: string          -- absolute path of the referenced image
    boxes:    array<array<double>>
                               -- [xmin,ymin,xmax,ymax] per word, or the 4
                                  [x,y] corners when use_polygons=True
    labels:   array<string>   -- per-box word transcriptions (or polygon
                                  class names for the detection format)

matching the reference target contract `dict(boxes=..., labels=...)`.
Missing-image existence checks are a join against the image listing at
scale, not a per-row driver stat; loaders therefore do not stat files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql import types as T  # noqa: N812

# the reference's single-class marker for list-form detection labels
# (doctr/file_utils.py:11)
CLASS_NAME = "words"


def _stem(col: Column) -> Column:
    return F.regexp_extract(col, r"([^/]+)\.[A-Za-z0-9]+$", 1)


def _xyxy_to_corners(box: Column) -> Column:
    """[xmin,ymin,xmax,ymax] -> 4 clockwise-from-top-left [x,y] corners
    (the reference's use_polygons expansion, funsd.py:95-104)."""
    return F.array(
        F.array(box[0], box[1]),
        F.array(box[2], box[1]),
        F.array(box[2], box[3]),
        F.array(box[0], box[3]),
    )


def _flat_poly_to_corners(poly: Column) -> Column:
    """Flattened [x0,y0,...,x3,y3] annotation corners -> (4, 2) arrays."""
    return F.array(
        F.array(poly[0], poly[1]),
        F.array(poly[2], poly[3]),
        F.array(poly[4], poly[5]),
        F.array(poly[6], poly[7]),
    )


def _assemble(words: DataFrame, use_polygons: bool) -> DataFrame:
    """(img_path, ord, box, label[, poly]) word rows -> one row per image
    with order-preserving boxes/labels arrays (sort_array over a keyed
    struct keeps the annotation-file order deterministic after the
    shuffle). When the annotation carries true rotated corners (a ``poly``
    column, e.g. SynthText's wordBB tensors), ``use_polygons=True`` returns
    those instead of fabricating axis-aligned corners from the xyxy
    collapse (reference `doctr/datasets/synthtext.py:106-116` keeps the
    rotated geometry in its use_polygons branch)."""
    has_poly = "poly" in words.columns
    fields = ["ord", "box", "label"] + (["poly"] if has_poly else [])
    packed = words.groupBy("img_path").agg(
        F.sort_array(F.collect_list(F.struct(*fields))).alias("ws")
    )

    def geom(w):
        if not use_polygons:
            return w["box"]
        if has_poly:
            return F.when(w["poly"].isNotNull(), _flat_poly_to_corners(w["poly"])).otherwise(
                _xyxy_to_corners(w["box"])
            )
        return _xyxy_to_corners(w["box"])

    return packed.select(
        "img_path",
        F.transform("ws", geom).alias("boxes"),
        F.transform("ws", lambda w: w["label"]).alias("labels"),
    )


_FUNSD_SCHEMA = T.StructType(
    [
        T.StructField(
            "form",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "words",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("text", T.StringType()),
                                        T.StructField("box", T.ArrayType(T.DoubleType())),
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def load_funsd(
    spark: SparkSession, root: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """FUNSD: per-image `annotations/<stem>.json` with form blocks of words
    (reference `doctr/datasets/funsd.py:70-124`). Empty-text words are
    dropped; order is (block, word) within the file."""
    sub = "training_data" if train else "testing_data"
    base = f"{root}/dataset/{sub}"
    ann = (
        spark.read.schema(_FUNSD_SCHEMA)
        .option("multiLine", "true")
        .json(f"{base}/annotations/*.json")
        .withColumn("stem", _stem(F.input_file_name()))
    )
    words = (
        ann.select("stem", F.posexplode("form").alias("bi", "block"))
        .select("stem", "bi", F.posexplode("block.words").alias("wi", "word"))
        .where(F.length("word.text") > 0)
        .select(
            F.concat(F.lit(f"{base}/images/"), F.col("stem"), F.lit(".png")).alias("img_path"),
            (F.col("bi") * F.lit(100000) + F.col("wi")).alias("ord"),
            F.col("word.box").alias("box"),
            F.col("word.text").alias("label"),
        )
    )
    return _assemble(words, use_polygons)


_CORD_QUAD = T.StructType([T.StructField(k, T.DoubleType()) for k in
                           ("x1", "x2", "x3", "x4", "y1", "y2", "y3", "y4")])  # fmt: skip
_CORD_SCHEMA = T.StructType(
    [
        T.StructField(
            "valid_line",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "words",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("text", T.StringType()),
                                        T.StructField("quad", _CORD_QUAD),
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def load_cord(
    spark: SparkSession, root: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """CORD: per-image `json/<stem>.json` with valid_line word quads
    (reference `doctr/datasets/cord.py:75-133`). Straight boxes reduce the
    8 quad coords to min/max; polygons keep the 4 corners as-is."""
    del train  # train/test split is two separate archives with one layout
    q = F.col("word.quad")
    xs = F.array(q["x1"], q["x2"], q["x3"], q["x4"])
    ys = F.array(q["y1"], q["y2"], q["y3"], q["y4"])
    ann = (
        spark.read.schema(_CORD_SCHEMA)
        .option("multiLine", "true")
        .json(f"{root}/json/*.json")
        .withColumn("stem", _stem(F.input_file_name()))
    )
    words = (
        ann.select("stem", F.posexplode("valid_line").alias("li", "line"))
        .select("stem", "li", F.posexplode("line.words").alias("wi", "word"))
        .where(F.length("word.text") > 0)
        .select(
            F.concat(F.lit(f"{root}/image/"), F.col("stem"), F.lit(".png")).alias("img_path"),
            (F.col("li") * F.lit(100000) + F.col("wi")).alias("ord"),
            (
                F.array(
                    F.array(q["x1"], q["y1"]),
                    F.array(q["x2"], q["y2"]),
                    F.array(q["x3"], q["y3"]),
                    F.array(q["x4"], q["y4"]),
                )
                if use_polygons
                else F.array(F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys))
            ).alias("box"),
            F.col("word.text").alias("label"),
        )
    )
    # CORD quads are already polygons; _assemble must not re-expand them
    return _assemble(words, use_polygons=False)


def load_sroie(
    spark: SparkSession, root: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """SROIE: per-image `annotations/<stem>.txt`, one CSV row per word:
    8 int corner coords then the transcription, which may itself contain
    commas (reference `doctr/datasets/sroie.py:85-113` keeps row[8:]
    rejoined). Files are read wholetext so line order is preserved."""
    del train
    lines = (
        spark.read.text(f"{root}/annotations/*.txt", wholetext=True)
        .withColumn("stem", _stem(F.input_file_name()))
        .select("stem", F.posexplode(F.split("value", "\n")).alias("ord", "row"))
        # malformed rows (wrong field count / non-numeric coords) drop out
        # instead of failing the ANSI cast — quarantine, not crash
        .where(F.col("row").rlike(r"^\s*(-?\d+\s*,\s*){8}.+"))
    )
    parts = F.split("row", ",", 9)  # limit keeps commas inside the label
    corners = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.array(
            F.get(parts, i * 2).cast("double"), F.get(parts, i * 2 + 1).cast("double")
        ),
    )
    xs = F.transform(corners, lambda c: c[0])
    ys = F.transform(corners, lambda c: c[1])
    words = lines.select(
        F.concat(F.lit(f"{root}/images/"), F.col("stem"), F.lit(".jpg")).alias("img_path"),
        F.col("ord").cast("long").alias("ord"),
        (
            corners
            if use_polygons
            else F.array(F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys))
        ).alias("box"),
        parts[8].alias("label"),
    )
    return _assemble(words, use_polygons=False)


_POLY = T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))  # (N, 4, 2)


def load_detection_dataset(
    spark: SparkSession, img_folder: str, label_path: str, use_polygons: bool = False
) -> DataFrame:
    """DetectionDataset: ONE labels.json mapping img name -> {"polygons":
    list | {class: list}} (reference `doctr/datasets/detection.py:56-93`).
    Both label shapes parse natively: the file is read wholetext and
    `from_json` is applied twice (list-form and dict-form schemas), the
    non-null parse winning per image. `labels` carries the per-polygon
    class name (the reference's single-class marker for list form)."""
    list_schema = T.MapType(
        T.StringType(), T.StructType([T.StructField("polygons", _POLY)])
    )
    dict_schema = T.MapType(
        T.StringType(),
        T.StructType([T.StructField("polygons", T.MapType(T.StringType(), _POLY))]),
    )
    raw = spark.read.text(label_path, wholetext=True)
    per_img = raw.select(
        F.explode(F.from_json("value", list_schema)).alias("img_name", "as_list"),
    ).join(
        raw.select(F.explode(F.from_json("value", dict_schema)).alias("img_name", "as_dict")),
        "img_name",
        "left",
    )
    # dict-form polygons flatten to (class, polygon) pairs; list form tags
    # every polygon with the reference's CLASS_NAME
    pairs = per_img.select(
        "img_name",
        F.when(
            F.col("as_list.polygons").isNotNull(),
            F.transform(
                "as_list.polygons", lambda p: F.struct(F.lit(CLASS_NAME).alias("cls"), p.alias("poly"))
            ),
        )
        .otherwise(
            F.flatten(
                F.transform(
                    F.map_entries("as_dict.polygons"),
                    lambda e: F.transform(
                        e["value"], lambda p: F.struct(e["key"].alias("cls"), p.alias("poly"))
                    ),
                )
            )
        )
        .alias("ps"),
    )
    geom = (
        (lambda p: p)
        if use_polygons
        else (
            lambda p: F.array(
                F.array_min(F.transform(p, lambda c: c[0])),
                F.array_min(F.transform(p, lambda c: c[1])),
                F.array_max(F.transform(p, lambda c: c[0])),
                F.array_max(F.transform(p, lambda c: c[1])),
            )
        )
    )
    return pairs.select(
        F.concat(F.lit(f"{img_folder}/"), F.col("img_name")).alias("img_path"),
        F.transform("ps", lambda s: geom(s["poly"])).alias("boxes"),
        F.transform("ps", lambda s: s["cls"]).alias("labels"),
    )


def load_recognition_dataset(
    spark: SparkSession, img_folder: str, labels_path: str
) -> DataFrame:
    """RecognitionDataset: ONE labels.json mapping crop image name -> label
    string (reference `doctr/datasets/recognition.py:31-47`). Returns
    (img_path, label) rows."""
    return (
        spark.read.text(labels_path, wholetext=True)
        .select(
            F.explode(F.from_json("value", T.MapType(T.StringType(), T.StringType()))).alias(
                "img_name", "label"
            )
        )
        .select(
            F.concat(F.lit(f"{img_folder}/"), F.col("img_name")).alias("img_path"),
            "label",
        )
    )


def load_ocr_dataset(
    spark: SparkSession, img_folder: str, label_file: str, use_polygons: bool = False
) -> DataFrame:
    """OCRDataset: ONE label file mapping img name -> {"typed_words":
    [{"geometry": [xmin,ymin,xmax,ymax,...], "value": str}]} (reference
    `doctr/datasets/ocr.py:34-71`); empty images keep an empty boxes row."""
    schema = T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField(
                    "typed_words",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("geometry", T.ArrayType(T.DoubleType())),
                                T.StructField("value", T.StringType()),
                            ]
                        )
                    ),
                )
            ]
        ),
    )
    box = lambda g: F.slice(g, 1, 4)  # noqa: E731
    return (
        spark.read.text(label_file, wholetext=True)
        .select(F.explode(F.from_json("value", schema)).alias("img_name", "ann"))
        .select(
            F.concat(F.lit(f"{img_folder}/"), F.col("img_name")).alias("img_path"),
            F.transform(
                "ann.typed_words",
                lambda w: _xyxy_to_corners(box(w["geometry"])) if use_polygons else box(w["geometry"]),
            ).alias("boxes"),
            F.transform("ann.typed_words", lambda w: w["value"]).alias("labels"),
        )
    )


_SVT_RECT = T.StructType(
    [
        T.StructField("_x", T.DoubleType()),
        T.StructField("_y", T.DoubleType()),
        T.StructField("_width", T.DoubleType()),
        T.StructField("_height", T.DoubleType()),
        T.StructField("tag", T.StringType()),
    ]
)
_SVT_SCHEMA = T.StructType(
    [
        T.StructField("imageName", T.StringType()),
        T.StructField(
            "taggedRectangles",
            T.StructType([T.StructField("taggedRectangle", T.ArrayType(_SVT_RECT))]),
        ),
    ]
)


def load_svt(
    spark: SparkSession, root: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """SVT: one train.xml/test.xml, <image> elements with taggedRectangle
    (x, y, width, height) attributes and a <tag> label (reference
    `doctr/datasets/svt.py:68-120`, ElementTree walk re-expressed on the
    native XML source with rowTag=image)."""
    path = f"{root}/svt1/{'train' if train else 'test'}.xml"
    imgs = (
        spark.read.format("xml")
        .option("rowTag", "image")
        .schema(_SVT_SCHEMA)
        .load(path)
    )
    rect_box = lambda r: F.array(r["_x"], r["_y"], r["_x"] + r["_width"], r["_y"] + r["_height"])  # noqa: E731
    return imgs.select(
        F.concat(F.lit(f"{root}/svt1/"), F.col("imageName")).alias("img_path"),
        F.transform(
            "taggedRectangles.taggedRectangle",
            lambda r: _xyxy_to_corners(rect_box(r)) if use_polygons else rect_box(r),
        ).alias("boxes"),
        F.transform("taggedRectangles.taggedRectangle", lambda r: r["tag"]).alias("labels"),
    )


def load_ic13(
    spark: SparkSession,
    img_folder: str,
    label_folder: str,
    use_polygons: bool = False,
    img_ext: str = ".png",
) -> DataFrame:
    """IC13: per-image `gt_<stem>.txt`, rows of 4 int coords then a quoted
    transcription, comma- or space-delimited (reference
    `doctr/datasets/ic13.py:75-100` strips trailing commas per field and
    the surrounding quotes)."""
    rx = r'^\s*(\d+),?\s+(\d+),?\s+(\d+),?\s+(\d+),?\s+"?(.*?)"?\s*$'
    lines = (
        spark.read.text(f"{label_folder}/gt_*.txt", wholetext=True)
        .withColumn("stem", F.regexp_extract(F.input_file_name(), r"gt_([^/]+)\.txt$", 1))
        .select("stem", F.posexplode(F.split("value", "\n")).alias("ord", "row"))
        .where(F.col("row").rlike(rx))  # malformed rows quarantine, not crash
    )
    box = F.array(*[F.regexp_extract("row", rx, i).cast("double") for i in range(1, 5)])
    words = lines.select(
        F.concat(F.lit(f"{img_folder}/"), F.col("stem"), F.lit(img_ext)).alias("img_path"),
        F.col("ord").cast("long").alias("ord"),
        box.alias("box"),
        F.regexp_extract("row", rx, 5).alias("label"),
    )
    return _assemble(words, use_polygons)


_WILD_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField(
            "annotations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("box", T.ArrayType(T.DoubleType())),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def load_wildreceipt(
    spark: SparkSession, img_folder: str, label_path: str, use_polygons: bool = False
) -> DataFrame:
    """WildReceipt: a JSON-lines label file, one record per image with
    8-coord word boxes (reference `doctr/datasets/wildreceipt.py:80-115`).
    JSONL is Spark's native json layout — the whole parse is one schema'd
    read."""
    ann = spark.read.schema(_WILD_SCHEMA).json(label_path)
    xs = lambda b: F.array(b[0], b[2], b[4], b[6])  # noqa: E731
    ys = lambda b: F.array(b[1], b[3], b[5], b[7])  # noqa: E731
    corners = lambda b: F.array(  # noqa: E731
        F.array(b[0], b[1]), F.array(b[2], b[3]), F.array(b[4], b[5]), F.array(b[6], b[7])
    )
    straight = lambda b: F.array(  # noqa: E731
        F.array_min(xs(b)), F.array_min(ys(b)), F.array_max(xs(b)), F.array_max(ys(b))
    )
    geom = corners if use_polygons else straight
    return ann.select(
        F.concat(F.lit(f"{img_folder}/"), F.col("file_name")).alias("img_path"),
        F.transform("annotations", lambda a: geom(a["box"])).alias("boxes"),
        F.transform("annotations", lambda a: a["text"]).alias("labels"),
    )


_COCO_IMG = T.MapType(
    T.StringType(),
    T.StructType([T.StructField("file_name", T.StringType()), T.StructField("set", T.StringType())]),
)
_COCO_ANN = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("image_id", T.LongType()),
            T.StructField("legibility", T.StringType()),
            T.StructField("bbox", T.ArrayType(T.DoubleType())),
            T.StructField("utf8_string", T.StringType()),
        ]
    ),
)


def load_coco_text(
    spark: SparkSession, img_folder: str, label_path: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """COCO-Text: ONE label json with `imgs` and `anns` maps joined on
    image_id, keeping legible annotations in the requested split
    (reference `doctr/datasets/coco_text.py:77-135`). The two maps explode
    to DataFrames and the id match is a real join — at full-dataset scale
    the ann side shuffles on image_id instead of scanning per image."""
    raw = spark.read.text(label_path, wholetext=True)
    raw = raw.select(
        F.from_json(F.get_json_object("value", "$.imgs"), _COCO_IMG).alias("imgs"),
        F.from_json(F.get_json_object("value", "$.anns"), _COCO_ANN).alias("anns"),
    )
    imgs = raw.select(F.explode("imgs").alias("img_id", "img")).where(
        (F.col("img.set") == "train") == F.lit(train)
    )
    anns = raw.select(F.explode("anns").alias("ann_id", "ann")).where(
        F.col("ann.legibility") == "legible"
    )
    b = F.col("ann.bbox")
    box = F.array(b[0], b[1], b[0] + b[2], b[1] + b[3])
    words = anns.select(
        F.col("ann.image_id").cast("string").alias("img_id"),
        F.col("ann_id").cast("long").alias("ord"),
        (_xyxy_to_corners(box) if use_polygons else box).alias("box"),
        F.col("ann.utf8_string").alias("label"),
    ).join(
        imgs.select("img_id", F.concat(F.lit(f"{img_folder}/"), F.col("img.file_name")).alias("img_path")),
        "img_id",
    )
    # reference floors boxes to int and clips at 0
    words = words.select(
        "img_path",
        "ord",
        F.transform("box", lambda v: F.greatest(v.cast("bigint").cast("double"), F.lit(0.0))).alias("box"),
        "label",
    )
    return _assemble(words, use_polygons=False)


def load_mjsynth(spark: SparkSession, img_folder: str, label_path: str) -> DataFrame:
    """MJSynth: pure recognition; imlist.txt holds relative image paths and
    the label is the middle filename segment `<idx>_<LABEL>_<tag>.jpg`
    (reference `doctr/datasets/mjsynth.py:93-106`)."""
    return (
        spark.read.text(label_path)
        .where(F.length(F.trim("value")) > 0)
        .select(
            F.concat(F.lit(f"{img_folder}/"), F.regexp_replace(F.trim("value"), r"^\./", "")).alias(
                "img_path"
            ),
            F.regexp_extract(F.trim("value"), r"[^/]*_([^_/]+)_[^_/]*$", 1).alias("label"),
        )
    )


_IMGUR_MAP = T.MapType(T.StringType(), T.ArrayType(T.StringType()))
_IMGUR_ANN = T.MapType(
    T.StringType(),
    T.StructType(
        [T.StructField("word", T.StringType()), T.StructField("bounding_box", T.StringType())]
    ),
)


def load_imgur5k(
    spark: SparkSession, img_folder: str, label_path: str, img_ext: str = ".jpg"
) -> DataFrame:
    """IMGUR5K: ONE label json with `index_to_ann_map` (img -> ann ids) and
    `ann_id` (id -> word + "[xc, yc, w, h, angle]" string); '.' words are
    unannotated placeholders (reference `doctr/datasets/imgur5k.py:97-125`).
    The rotated box decodes to 4 corners with native trig (cv2.boxPoints
    re-expressed; angle in degrees, y down)."""
    raw = spark.read.text(label_path, wholetext=True).select(
        F.from_json(F.get_json_object("value", "$.index_to_ann_map"), _IMGUR_MAP).alias("idx"),
        F.from_json(F.get_json_object("value", "$.ann_id"), _IMGUR_ANN).alias("ann"),
    )
    pairs = raw.select(F.explode("idx").alias("img_id", "ann_ids"), "ann").select(
        "img_id", F.posexplode("ann_ids").alias("ord", "aid"), "ann"
    )
    w = F.element_at("ann", F.col("aid"))
    nums = F.split(F.regexp_replace(w["bounding_box"], r"[\[\] ]", ""), ",")
    c = [nums[i].cast("double") for i in range(5)]
    xc, yc, bw, bh, ang = c
    rad = F.radians(ang)
    cosr, sinr = F.cos(rad), F.sin(rad)
    dx, dy = bw / 2, bh / 2
    corner = lambda sx, sy: F.array(  # noqa: E731
        xc + sx * dx * cosr - sy * dy * sinr, yc + sx * dx * sinr + sy * dy * cosr
    )
    words = pairs.where(w["word"] != ".").select(
        F.concat(F.lit(f"{img_folder}/"), F.col("img_id"), F.lit(img_ext)).alias("img_path"),
        F.col("ord").cast("long").alias("ord"),
        F.array(corner(-1, -1), corner(1, -1), corner(1, 1), corner(-1, 1)).alias("box"),
        w["word"].alias("label"),
    )
    return _assemble(words, use_polygons=False)


def load_svhn(
    spark: SparkSession, folder: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """SVHN loader (reference `doctr/datasets/svhn.py:82-127`, h5py
    replaced by the from-scratch HDF5 codec `kernels/hdf5.py`):
    ``digitStruct.mat`` is a MATLAB v7.3 = HDF5 file where
    ``/digitStruct/name`` holds object references to uint16 char matrices
    (the filenames) and ``/digitStruct/bbox`` references one group per
    image with height/left/top/width/label fields — each a (1,1) float64
    scalar for single-digit images or a column of object references to
    scalars for multi-digit ones (both branches, like the reference's
    ``box["left"].shape[0] == 1`` split). Boxes are [left, top, w, h] ->
    xyxy; labels are ``str(int(label))`` for parity (SVHN keeps '10' for
    the digit 0, and so does the reference)."""

    raw = spark.read.format("binaryFile").load(f"{folder}/digitStruct.mat").select("content")

    def fn(batches):
        import pandas as pd

        from ..kernels.hdf5 import H5File

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                f = H5File(bytes(blob))
                names = f["digitStruct/name"]
                bboxes = f["digitStruct/bbox"]
                for i in range(names.shape[0]):
                    img = "".join(map(chr, f.deref(names.data[i, 0]).data.flatten()))
                    box = f.deref(bboxes.data[i, 0])

                    def field(key):
                        ds = box[key]
                        if ds.is_ref:
                            return [int(f.deref(r).data.item()) for r in ds.data[:, 0]]
                        return [int(ds.data[0, 0])]

                    lefts, tops = field("left"), field("top")
                    widths, heights = field("width"), field("height")
                    labels = field("label")
                    for o, (x, y, bw, bh, lab) in enumerate(
                        zip(lefts, tops, widths, heights, labels)
                    ):
                        rows.append(
                            (
                                f"{folder}/{img}",
                                o,
                                [float(x), float(y), float(x + bw), float(y + bh)],
                                str(lab),
                            )
                        )
            yield pd.DataFrame(rows, columns=["img_path", "ord", "box", "label"])

    words = raw.mapInPandas(fn, "img_path string, ord long, box array<double>, label string")
    return _assemble(words, use_polygons)


def _mat_word_rows(spark: SparkSession, mat_path: str, parse_fn) -> DataFrame:
    """Parse one .mat annotation file into (img_path, ord, box, label)
    word rows. The file enters through the binaryFile source and is parsed
    in an EXECUTOR task (never the driver); the exploded word rows then
    shuffle into the standard ``_assemble`` path like every other loader.
    At real corpus scale (SynthText's gt.mat is ~400 MB for 858k pages)
    the parse is a one-time single task whose output is the distributed
    object — for repeated runs convert once to parquet."""

    raw = spark.read.format("binaryFile").load(mat_path).select("content")

    def fn(batches):
        import pandas as pd

        from ..kernels.matv5 import loadmat_bytes

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                # parse rows are (img_path, ord, box, label) or, when the
                # annotation has true rotated corners, + a flattened 8-value
                # polygon (None pads the 4-tuple loaders)
                rows.extend(r if len(r) == 5 else (*r, None) for r in parse_fn(loadmat_bytes(bytes(blob))))
            yield pd.DataFrame(rows, columns=["img_path", "ord", "box", "label", "poly"])

    return raw.mapInPandas(
        fn, "img_path string, ord long, box array<double>, label string, poly array<double>"
    )


def load_synthtext(
    spark: SparkSession, folder: str, train: bool | None = None, use_polygons: bool = False
) -> DataFrame:
    """SynthText loader (reference `doctr/datasets/synthtext.py:91-118`,
    scipy.io replaced by the from-scratch MAT v5 codec
    `kernels/matv5.py`): ``gt.mat`` holds parallel cells ``imnames`` /
    ``wordBB`` (2 x 4 x M corner tensors, or 2 x 4 for a single word) /
    ``txt`` (char matrices whose whitespace-split rows are the word
    labels). ``train`` slices the reference's 90/10 split; None loads all.
    """
    import numpy as np

    def parse(mat):
        imnames, wordbb, txt = mat["imnames"], mat["wordBB"], mat["txt"]
        n_train = int(len(imnames) * 0.9)
        sl = slice(None) if train is None else (slice(n_train) if train else slice(n_train, None))
        rows = []
        for img, bb, t in zip(imnames[sl], wordbb[sl], txt[sl]):
            labels = [w for line in ([t] if isinstance(t, str) else t) for w in line.split()]
            bb = np.asarray(bb, dtype=float)
            # (M, 4, 2) corners in TL,TR,BR,BL order (synthtext.py:108-112)
            polys = bb.transpose(2, 1, 0) if bb.ndim == 3 else bb.transpose(1, 0)[None]
            boxes = np.concatenate((polys.min(axis=1), polys.max(axis=1)), axis=1)
            for o, (box, poly, label) in enumerate(zip(boxes, polys, labels)):
                rows.append(
                    (
                        f"{folder}/{img}",
                        o,
                        [float(v) for v in box],
                        label,
                        [float(v) for v in poly.reshape(-1)],
                    )
                )
        return rows

    return _assemble(_mat_word_rows(spark, f"{folder}/gt.mat", parse), use_polygons)


def load_iiit5k(
    spark: SparkSession, folder: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """IIIT5K character-level loader (reference
    `doctr/datasets/iiit5k.py:73-106` via the MAT v5 codec): a struct
    array (ImgName, chars, charBB) per image; each character's
    [x, y, w, h] box becomes xyxy and each char is one label."""
    import numpy as np

    var = "trainCharBound" if train else "testCharBound"

    def parse(mat):
        rows = []
        for rec in mat[var]:
            label = rec["chars"]
            boxes = np.asarray(rec["charBB"], dtype=float).reshape(-1, 4)
            for o, (box, ch) in enumerate(zip(boxes, label)):
                x, y, w, h = (float(v) for v in box)
                rows.append((f"{folder}/{rec['ImgName']}", o, [x, y, x + w, y + h], ch))
        return rows

    return _assemble(_mat_word_rows(spark, f"{folder}/{var}.mat", parse), use_polygons)
