import numpy as np

from doctr_spark.config import GLYPH_H
from doctr_spark.kernels.builder import build_page
from doctr_spark.kernels.glyphs import draw_word, word_width
from doctr_spark.kernels.language import get_language
from doctr_spark.kernels.recognition import recognize_crop, whitelist_mask
from doctr_spark.kernels.vocab import DEFAULT_VOCAB


def _crop(text):
    canvas = np.zeros((GLYPH_H, word_width(text)), dtype=np.uint8)
    draw_word(canvas, 0, 0, text)
    return canvas


def test_whitelist_mask_shape():
    m = whitelist_mask(DEFAULT_VOCAB, "abc")
    assert m.shape == (len(DEFAULT_VOCAB) + 1,)
    assert m[DEFAULT_VOCAB.index("a")] == 0.0
    assert np.isneginf(m[DEFAULT_VOCAB.index("z")])
    assert m[-1] > 0.0  # blank always allowed (with a masked-frame tie-break nudge)


def test_whitelist_constrains_decoding():
    # digits-only whitelist drops the letters from a mixed word
    value, conf = recognize_crop(_crop("ab12cd"), whitelist="0123456789")
    assert value == "12"
    # unconstrained baseline
    assert recognize_crop(_crop("ab12cd"))[0] == "ab12cd"


def test_whitelist_nearest_mode_folds_case():
    # lowercase-only whitelist: "mask" drops the capitals, "nearest"
    # reassigns them onto their case-fold (the reference's transliteration
    # fold restricted to ASCII, models/utils/pytorch.py:288-311)
    lower = "abcdefghijklmnopqrstuvwxyz"
    value, _ = recognize_crop(_crop("AbC"), whitelist=lower, whitelist_mode="mask")
    assert value == "b"
    value, _ = recognize_crop(_crop("AbC"), whitelist=lower, whitelist_mode="nearest")
    assert value == "abc"
    # characters with no fold target still fall back to masking
    value, _ = recognize_crop(_crop("a1b"), whitelist=lower, whitelist_mode="nearest")
    assert value == "ab"


def test_get_language():
    """Cavnar-Trenkle n-gram classifier over the six embedded profiles."""
    cases = {
        "the cat and the dog of a house": "en",
        "el perro y la casa de los gatos": "es",
        "le chien dort dans la maison avec les enfants": "fr",
        "der hund schlaft im haus und die kinder spielen": "de",
        "il gatto dorme nella casa dei bambini": "it",
        "o cachorro dorme na casa das criancas": "pt",
        "ο σκυλος κοιμαται στο σπιτι με τα παιδια": "el",
        "собака спит в доме с детьми и книгой": "ru",
        "de hond slaapt in het huis van de buren": "nl",
        "pies śpi w domu z dziećmi i książką": "pl",
        "الكلب ينام في البيت مع الأطفال": "ar",
        "狗在房子里睡觉孩子们在花园里玩耍": "zh",
        "犬は家で眠っています子供たちは庭で遊んでいます": "ja",
        "개는 집에서 자고 아이들은 정원에서 놀고 있다": "ko",
        "köpek evde uyuyor ve çocuklar bahçede oynuyor": "tr",
        "कुत्ता घर में सोता है और बच्चे बगीचे में खेलते हैं": "hi",
    }
    for text, expected in cases.items():
        lang, conf = get_language(text)
        assert lang == expected, (text, lang)
        # CJK short samples rank fewer shared grams, so their margin is
        # structurally lower (1-gram-dominant profiles)
        assert conf > (0.3 if expected in ("zh", "ja", "ko") else 0.5)
    assert get_language("") == ("unknown", 0.0)
    assert get_language("zzz qqq")[0] == "unknown"
    assert get_language("12345 67890")[0] == "unknown"


def test_build_page_language_detection():
    boxes = np.array([[0.05, 0.1, 0.15, 0.16], [0.17, 0.1, 0.25, 0.16]])
    page = build_page(
        boxes, np.array([0.8, 0.8]), ["the", "and"], [0.9, 0.9], (256, 512), detect_language=True
    )
    assert page["language"]["value"] == "en"
    assert page["language"]["confidence"] > 0.5


def test_translate_nfd_fold():
    from doctr_spark.kernels.vocab import UNKNOWN_CHAR, translate

    # accents fold to their ASCII base via NFD (reference datasets/utils.py:35-66)
    assert translate("café résumé", "latin") == "café résumé".replace("é", "e").replace(" ", "")
    assert translate("naïve", "ascii_letters") == "naive"
    # whitespace dropped, unmappables become the unknown char
    assert translate("a b€c", "latin") == f"ab{UNKNOWN_CHAR}c"
    # vocab gate
    import pytest

    with pytest.raises(KeyError):
        translate("x", "nope")


def test_non_latin_vocabs_render_roundtrip():
    """Greek and Cyrillic working vocabs fit the 7-bit glyph space and
    survive the full draw -> detect -> recognize path, like hebrew."""
    from doctr_spark.kernels.detection import detect_words, extract_crops
    from doctr_spark.kernels.glyphs import draw_word
    from doctr_spark.kernels.recognition import recognize_crops_batched
    from doctr_spark.kernels.vocab import VOCABS, decode_sequence, encode_string

    samples = {"greek": ["αβγ", "λόγος", "ΔΕΛΤΑ42"], "cyrillic": ["привет", "МИР7", "ёжик"]}
    for name, words in samples.items():
        vocab = VOCABS[name]
        assert len(vocab) <= 127, (name, len(vocab))
        for w in words:
            assert decode_sequence(encode_string(w, vocab), vocab) == w
        canvas = np.zeros((40, 400), dtype=np.uint8)
        x = 8
        for w in words:
            x = draw_word(canvas, x, 10, w, vocab)[2] + 10
        boxes, _, _ = detect_words(canvas)
        vals = recognize_crops_batched(extract_crops(canvas, boxes), vocab=vocab)
        assert sorted(v for v, _ in vals) == sorted(words)
