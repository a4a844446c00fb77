"""PDF standard security handler (kernels/pdfcrypt.py + the parse_pdf
decrypt hook): cipher known-answer tests, O/U/key algorithm round trips,
and encrypted-file extraction parity.

Reference parity: docTR opens encrypted PDFs through pypdfium2's crypto
stack (`doctr/io/pdf.py:16-43`); here the §7.6 subset is from scratch.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.kernels import pdfcrypt as pc
from doctr_spark.kernels.pdf import encrypt_pdf, parse_pdf, write_pdf

PAGES = [[(30, 40, "hello"), (96, 40, "world")], [(30, 40, "again"), (90, 40, "twice")]]


def test_aes_fips197_known_answers():
    """FIPS-197 Appendix C vectors — the from-scratch block cipher is the
    real AES, not an approximation."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk128 = pc._expand_key(bytes(range(16)))
    rk256 = pc._expand_key(bytes(range(32)))
    assert pc._enc_block(pt, rk128).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert pc._enc_block(pt, rk256).hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert pc._dec_block(pc._enc_block(pt, rk128), rk128) == pt
    assert pc._dec_block(pc._enc_block(pt, rk256), rk256) == pt


def test_rc4_known_answers():
    assert pc.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert pc.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    # symmetric
    assert pc.rc4(b"Key", pc.rc4(b"Key", b"payload")) == b"payload"


@given(st.binary(min_size=0, max_size=100), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_aes_cbc_roundtrip_property(data, seed):
    rng = np.random.default_rng(seed)
    key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    iv = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    assert pc.aes_cbc_decrypt(key, iv, pc.aes_cbc_encrypt(key, iv, data)) == data


@pytest.mark.parametrize("r,bits", [(2, 40), (3, 128), (4, 128)])
def test_key_algorithms_self_consistent(r, bits):
    """Algorithms 2-5 agree: the key derived from the EMPTY user password
    validates the /U value computed from that same key."""
    id0 = bytes(range(16))
    o = pc.compute_o(b"", b"", r, bits)
    key = pc.compute_key(b"", o, -4, id0, r, bits)
    u = pc.compute_u(key, id0, r)
    assert len(o) == 32 and len(u) == 32
    assert pc.check_user_password(key, u, id0, r)
    # a different password's key must NOT validate
    bad = pc.compute_key(b"wrong", o, -4, id0, r, bits)
    assert not pc.check_user_password(bad, u, id0, r)


def test_hash_2b_loop_structure():
    """Algorithm 2.B: >= 64 rounds, data-dependent digest choice, 32-byte
    output; distinct salts/passwords diverge."""
    a = pc.hash_2b(b"", b"saltsalt")
    b = pc.hash_2b(b"", b"SALTSALT")
    c = pc.hash_2b(b"pw", b"saltsalt")
    assert len(a) == 32 and a != b and a != c


def test_v5_algorithms_self_consistent():
    fkey = bytes(range(32))
    u, ue = pc.v5_make_u_ue(b"", fkey, b"vsaltvv0", b"ksaltkk0")
    assert len(u) == 48 and len(ue) == 32
    assert pc.v5_check_user_password(b"", u, 6)
    assert not pc.v5_check_user_password(b"wrong", u, 6)
    assert pc.v5_file_key(b"", u, ue, 6) == fkey
    data = b"stream payload bytes" * 7
    assert pc.decrypt_bytes_v5(fkey, pc.encrypt_bytes_v5(fkey, data, bytes(16))) == data


@pytest.mark.parametrize("variant", ["rc4-40", "rc4-128", "aes-128", "aes-256"])
def test_encrypted_pdf_roundtrip(variant):
    """encrypt_pdf -> parse_pdf extracts the identical word layout, and
    the plaintext genuinely isn't in the file."""
    plain = write_pdf(PAGES, (200, 300), compress=True)
    enc = encrypt_pdf(plain, variant)
    assert b"/Encrypt" in enc
    assert b"hello" not in enc and b"again" not in enc
    assert parse_pdf(enc) == parse_pdf(plain)


def test_encrypted_pdf15_and_scan():
    """Encryption layers over the 1.5 object-stream layout (ObjStm stream
    decrypts, XRef stream stays clear) and over image-XObject scans."""
    p15 = write_pdf(PAGES, (200, 300), pdf15=True)
    assert parse_pdf(encrypt_pdf(p15, "aes-128")) == parse_pdf(p15)
    img = (np.add.outer(np.arange(80), np.arange(120)) % 256).astype(np.uint8)
    scan = write_pdf([[]], (80, 120), images={0: [(img, 0, 0)]}, render_mode=3)
    ref = parse_pdf(scan)[0]
    got = parse_pdf(encrypt_pdf(scan, "rc4-128"))[0]
    assert got["size"] == ref["size"] and got["words"] == ref["words"]
    (x0, y0, i0), (x1, y1, i1) = ref["images"][0], got["images"][0]
    assert (x0, y0) == (x1, y1) and np.array_equal(i0, i1)


@pytest.mark.parametrize("variant", ["aes-128", "aes-256"])
def test_owner_password_only_still_opens(variant):
    """The mass-produced 'protected' layout: owner password set, user
    password empty — batch extraction must work."""
    enc = encrypt_pdf(write_pdf(PAGES, (200, 300)), variant, owner_pw=b"owner-secret")
    assert parse_pdf(enc) == parse_pdf(write_pdf(PAGES, (200, 300)))


def test_gates_reject_loudly():
    plain = write_pdf(PAGES, (200, 300))
    # non-empty USER password: cannot decrypt without prompting
    enc = encrypt_pdf(plain, "rc4-128", user_pw=b"secret")
    with pytest.raises(NotImplementedError, match="password-protected"):
        parse_pdf(enc)
    # an unsupported /V rejects loudly
    v3 = encrypt_pdf(plain, "aes-128").replace(b"/V 4 /R 4", b"/V 3 /R 3")
    with pytest.raises(NotImplementedError, match="/V 3"):
        parse_pdf(v3)
    # AES-256 with a non-empty user password rejects loudly too
    with pytest.raises(NotImplementedError, match="password-protected"):
        parse_pdf(encrypt_pdf(plain, "aes-256", user_pw=b"pw"))
    # non-Standard handler rejects loudly
    ns = encrypt_pdf(plain, "rc4-128").replace(b"/Filter /Standard", b"/Filter /MyCrypt0")
    with pytest.raises(NotImplementedError, match="security handler"):
        parse_pdf(ns)


def test_pdf_string_parsing():
    """O/U values arrive as hex OR literal strings with §7.3.4.2 escapes."""
    from doctr_spark.kernels.pdf import _pdf_string_at

    assert _pdf_string_at(b" <48656c6C6f>", 0) == b"Hello"
    assert _pdf_string_at(b"(simple)", 0) == b"simple"
    assert _pdf_string_at(b"(a\\(b\\)c)", 0) == b"a(b)c"
    assert _pdf_string_at(b"(nest(ed)ok)", 0) == b"nest(ed)ok"
    assert _pdf_string_at(b"(\\101\\12\\0)", 0) == b"A\n\x00"
    assert _pdf_string_at(b"(\\n\\t\\\\)", 0) == b"\n\t\\"
