import numpy as np
import pytest

from doctr_spark.config import GLYPH_H, GLYPH_W, INK
from doctr_spark.kernels.glyphs import draw_word, forward_logits, read_codes, word_width
from doctr_spark.kernels.vocab import DEFAULT_VOCAB, VOCABS, blank_index, decode_sequence, encode_string


def test_vocab_fits_code_bits():
    assert len(DEFAULT_VOCAB) < 128
    assert len(set(DEFAULT_VOCAB)) == len(DEFAULT_VOCAB)
    assert VOCABS["french"] == DEFAULT_VOCAB
    assert DEFAULT_VOCAB.startswith(VOCABS["latin"])  # ASCII indices unchanged


def test_encode_decode_roundtrip():
    s = "Hello,W0rld!"
    assert decode_sequence(encode_string(s)) == s
    with pytest.raises(ValueError):
        encode_string("space not in vocab ")


def test_draw_read_roundtrip():
    canvas = np.zeros((64, 256), dtype=np.uint8)
    box = draw_word(canvas, 8, 8, "spark123")
    assert box == (8, 8, 8 + word_width("spark123"), 8 + GLYPH_H)
    crop = canvas[box[1] : box[3], box[0] : box[2]]
    assert decode_sequence(read_codes(crop)) == "spark123"
    # ink bbox is exactly the word box
    ys, xs = np.nonzero(canvas)
    assert (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1) == box
    assert canvas.max() == INK


def test_read_codes_skips_partial_cells():
    canvas = np.zeros((GLYPH_H, 40), dtype=np.uint8)
    draw_word(canvas, 0, 0, "abcde")
    full = canvas[:, : word_width("abcde")]
    # truncated tail cell (not a full GLYPH_W) is ignored
    assert decode_sequence(read_codes(full[:, :-2])) == "abcd"
    # a damaged marker bar invalidates that cell only
    damaged = full.copy()
    damaged[3, 2 * GLYPH_W] = 0  # break 'c' marker
    assert decode_sequence(read_codes(damaged)) == "abde"


def test_forward_logits_ctc_shape():
    canvas = np.zeros((GLYPH_H, 40), dtype=np.uint8)
    draw_word(canvas, 0, 0, "aabb")
    logits = forward_logits(canvas[:, : word_width("aabb")])
    assert logits.shape == (12, len(DEFAULT_VOCAB) + 1)
    # blank frames between repeated chars are present
    assert logits[2].argmax() == blank_index()


def test_non_glyph_ink_is_unreadable_not_a_crash():
    """A crop of non-text ink (embedded photo, noise) encodes out-of-vocab
    bit patterns; recognition must return empty, not crash on the logits
    index (solid ink reads as code 127 > len(vocab))."""
    import numpy as np

    from doctr_spark.config import GLYPH_H
    from doctr_spark.kernels.recognition import recognize_crop

    solid = np.full((GLYPH_H, 40), 204, np.uint8)
    value, conf = recognize_crop(solid)
    assert value == ""
    value, conf = recognize_crop(solid, arch="attention")
    assert value == ""
