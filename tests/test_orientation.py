import numpy as np

from doctr_spark.config import GLYPH_H
from doctr_spark.kernels.glyphs import draw_word, word_width
from doctr_spark.kernels.orientation import estimate_crop_orientation, rectify_crop
from doctr_spark.kernels.recognition import recognize_crop


def _crop(text):
    canvas = np.zeros((GLYPH_H, word_width(text)), dtype=np.uint8)
    draw_word(canvas, 0, 0, text)
    return canvas


def test_upright_reports_zero():
    angle, conf = estimate_crop_orientation(_crop("hello"))
    assert angle == 0 and conf == 1.0


def test_rot180_detected_and_rectified():
    crop = np.rot90(_crop("spark42"), 2)
    angle, conf = estimate_crop_orientation(crop)
    assert angle == 180 and conf == 1.0
    assert recognize_crop(rectify_crop(crop, angle))[0] == "spark42"


def test_rot90_270_detected():
    base = _crop("abcdef")
    for k, expected in ((1, 90), (3, 270)):
        rot = np.rot90(base, k)
        angle, conf = estimate_crop_orientation(rot)
        assert angle == expected, (k, angle)
        assert recognize_crop(rectify_crop(rot, angle))[0] == "abcdef"


def test_square_word_no_false_positive():
    # 4-char word is 16x16: the 90/270 candidates are shape-valid but must
    # score below the true orientation
    crop = np.rot90(_crop("abcd"), 2)
    angle, conf = estimate_crop_orientation(crop)
    assert angle == 180
