"""Non-ASCII (Latin-1 accent) slice: fixture, pipeline, fold, whitelist."""

from pyspark.sql import functions as F

from doctr_spark.fixtures.accents import _fold_text, generate_accented_transcripts
from doctr_spark.kernels.recognition import apply_whitelist, ctc_best_path, nearest_whitelist_map
from doctr_spark.kernels.glyphs import forward_logits
from doctr_spark.kernels.vocab import DEFAULT_VOCAB, LATIN1_ACCENTS, ascii_fold_pairs, translate
from doctr_spark.operators.pipeline import extract_documents


def test_fold_pairs_cover_all_accents():
    src, dst = ascii_fold_pairs()
    assert src == LATIN1_ACCENTS
    assert len(src) == len(dst)
    assert dst.isascii()
    # fold of an accented upper char keeps case (É -> E)
    assert dict(zip(src, dst))["É"] == "E"


def test_translate_folds_accented_word():
    assert translate("élèvE", "latin") == "elevE"
    assert translate("Çà", "latin") == "Ca"


def test_nearest_whitelist_folds_accents():
    mapping = nearest_whitelist_map(DEFAULT_VOCAB, "abcdefghijklmnopqrstuvwxyz")
    pos = {c: i for i, c in enumerate(DEFAULT_VOCAB)}
    assert mapping[pos["é"]] == pos["e"]
    assert mapping[pos["Ç"]] == pos["c"]
    assert mapping[pos["A"]] == pos["a"]


def test_ctc_nearest_mode_recovers_accented_word():
    import numpy as np
    from doctr_spark.config import GLYPH_H
    from doctr_spark.kernels.glyphs import draw_word, word_width

    canvas = np.zeros((GLYPH_H, word_width("écolé")), dtype=np.uint8)
    draw_word(canvas, 0, 0, "écolé")
    logits = forward_logits(canvas)
    word, _ = ctc_best_path(
        apply_whitelist(logits, DEFAULT_VOCAB, "abcdefghijklmnopqrstuvwxyz", "nearest"),
        DEFAULT_VOCAB,
    )
    assert word == "ecole"


def test_accent_extraction_end_to_end(spark):
    tdf, gdf = generate_accented_transcripts(spark, 6, with_gt=True)
    docs = extract_documents(tdf)
    j = docs.join(gdf, ["conv_id", "turn_idx"])
    n, ok, ascii_ok = j.select(
        F.count("*"),
        F.sum((F.col("extracted_text") == F.col("gt_text")).cast("int")),
        F.sum(
            (
                F.translate(F.col("extracted_text"), *ascii_fold_pairs()) == F.col("gt_ascii")
            ).cast("int")
        ),
    ).first()
    assert n > 0 and ok == n and ascii_ok == n


def test_fold_text_preserves_structure():
    assert _fold_text("élan ça\n\n\n\nmot clé") == "elan ca\n\n\n\nmot cle"


def test_language_vocab_composites():
    """Latin-family composites follow the reference composition rule
    (vocabs.py:238-350): english base minus absent letters plus accents."""
    from doctr_spark.kernels.vocab import VOCABS, decode_sequence, encode_string

    assert VOCABS["english"].startswith(VOCABS["latin"])
    assert "ß" in VOCABS["german"] and "ñ" in VOCABS["spanish"]
    # letter-dropping rule: slovene drops QWXY from the english base
    assert not set("QqWwXxYy") & set(VOCABS["slovene"])
    # every composite round-trips through the index codec
    for lang in ("german", "spanish", "polish", "turkish", "portuguese"):
        v = VOCABS[lang]
        assert len(set(v)) == len(v)
        probe = v[:5] + v[-5:]
        assert decode_sequence(encode_string(probe, v), v) == probe
