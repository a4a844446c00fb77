"""PDF standard security handler (ISO 32000-1 §7.6) — from scratch.

The reference rasterizes encrypted PDFs through pypdfium2, which links
a real crypto stack (`doctr/io/pdf.py:16-43`); this container has no
crypto libraries beyond hashlib, so the PUBLIC-spec subset is built
here directly:

* RC4 (the §7.6.2 "Algorithm 1" symmetric cipher, 40..128-bit keys),
* AES-128/256 in CBC mode with PKCS#5 padding (§7.6.2 Algorithm 1.A;
  the block cipher is FIPS-197 implemented from its published S-box
  and MixColumns arithmetic),
* encryption-key derivation (Algorithm 2), owner/user password values
  O and U (Algorithms 3-5), and the per-object key (Algorithm 1 step
  a-c: MD5 over key + object number + generation (+ ``sAlT`` for AES)).

Only the EMPTY user password authenticates — a real password prompt
has no place in a batch engine, so files demanding one reject loudly
(the disclosed-gate contract). Used by `kernels.pdf.parse_pdf` for
decryption and by `encrypt_pdf` to build fixture files.
"""

from __future__ import annotations

import hashlib
import struct

# §7.6.3.3 padding string (Table 21 context)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)  # fmt: skip


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------ AES (FIPS-197)

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL = [[0] * 256 for _ in range(15)]
for _c in (1, 2, 3, 9, 11, 13, 14):
    for _a in range(256):
        v, a, c = 0, _a, _c
        while c:
            if c & 1:
                v ^= a
            a = _xtime(a)
            c >>= 1
        _MUL[_c][_a] = v


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys as 16-byte blocks (Nk=4 or 8 -> 10 or 14 rounds)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 128 or 256 bits")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ _RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _enc_block(block: bytes, rk: list[bytes]) -> bytes:
    s = bytes(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, len(rk)):
        s = bytes(_SBOX[s[_SHIFT[i]]] for i in range(16))  # SubBytes+ShiftRows
        if rnd != len(rk) - 1:  # MixColumns
            m2, m3 = _MUL[2], _MUL[3]
            s = bytes(
                [
                    x
                    for c in range(0, 16, 4)
                    for x in (
                        m2[s[c]] ^ m3[s[c + 1]] ^ s[c + 2] ^ s[c + 3],
                        s[c] ^ m2[s[c + 1]] ^ m3[s[c + 2]] ^ s[c + 3],
                        s[c] ^ s[c + 1] ^ m2[s[c + 2]] ^ m3[s[c + 3]],
                        m3[s[c]] ^ s[c + 1] ^ s[c + 2] ^ m2[s[c + 3]],
                    )
                ]
            )
        s = bytes(a ^ b for a, b in zip(s, rk[rnd]))
    return s


def _dec_block(block: bytes, rk: list[bytes]) -> bytes:
    s = bytes(a ^ b for a, b in zip(block, rk[-1]))
    for rnd in range(len(rk) - 2, -1, -1):
        s = bytes(_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16))
        s = bytes(a ^ b for a, b in zip(s, rk[rnd]))
        if rnd != 0:  # InvMixColumns
            m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
            s = bytes(
                [
                    x
                    for c in range(0, 16, 4)
                    for x in (
                        m14[s[c]] ^ m11[s[c + 1]] ^ m13[s[c + 2]] ^ m9[s[c + 3]],
                        m9[s[c]] ^ m14[s[c + 1]] ^ m11[s[c + 2]] ^ m13[s[c + 3]],
                        m13[s[c]] ^ m9[s[c + 1]] ^ m14[s[c + 2]] ^ m11[s[c + 3]],
                        m11[s[c]] ^ m13[s[c + 1]] ^ m9[s[c + 2]] ^ m14[s[c + 3]],
                    )
                ]
            )
    return s


def aes_cbc_encrypt(key: bytes, iv: bytes, plain: bytes, pad: bool = True) -> bytes:
    rk = _expand_key(key)
    if pad:
        n = 16 - len(plain) % 16
        plain = plain + bytes([n]) * n
    elif len(plain) % 16:
        raise ValueError("unpadded AES-CBC input must be block-aligned")
    out = bytearray()
    prev = iv
    for i in range(0, len(plain), 16):
        prev = _enc_block(bytes(a ^ b for a, b in zip(plain[i : i + 16], prev)), rk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, cipher: bytes, unpad: bool = True) -> bytes:
    if len(cipher) % 16:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(cipher), 16):
        blk = cipher[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_dec_block(blk, rk), prev))
        prev = blk
    if unpad and out:
        n = out[-1]
        if not 1 <= n <= 16:
            raise ValueError("bad AES-CBC padding")
        del out[len(out) - n :]
    return bytes(out)


# --------------------------------------------- §7.6.3 key/password algorithms


def _padded(password: bytes) -> bytes:
    return (password + PAD)[:32]


def compute_key(
    password: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    n = 5 if r == 2 else length_bits // 8
    h = hashlib.md5(_padded(password))
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, length_bits: int) -> bytes:
    """Algorithm 3: the /O value."""
    digest = hashlib.md5(_padded(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    n = 5 if r == 2 else length_bits // 8
    rc4_key = digest[:n]
    out = rc4(rc4_key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in rc4_key), out)
    return out


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R>=3): the /U value."""
    if r == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + id0).digest()
    out = rc4(key, digest)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16


def check_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    expect = compute_u(key, id0, r)
    return expect[:32] == u[:32] if r == 2 else expect[:16] == u[:16]


def object_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1 steps a-c: the per-object key."""
    h = hashlib.md5(key + struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(key) + 5, 16)]


# ------------------------------------- §7.6.4 (ISO 32000-2) AES-256 handler


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (R6 hardened hash): SHA-256 seed, then a data-
    dependent SHA-256/384/512 + AES-128-CBC loop of >= 64 rounds."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _v5_hash(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    # R5 (the withdrawn Adobe extension) hashes once; R6 uses 2.B
    if r == 5:
        return hashlib.sha256(password + salt + udata).digest()
    return hash_2b(password, salt, udata)


def v5_check_user_password(password: bytes, u: bytes, r: int) -> bool:
    """Algorithm 11: U is 48 bytes = hash(32) + validation salt(8) +
    key salt(8)."""
    return _v5_hash(password, u[32:40], b"", r) == u[:32]


def v5_file_key(password: bytes, u: bytes, ue: bytes, r: int) -> bytes:
    """Algorithm 8 step b: the 32-byte file key, AES-256-CBC-decrypted
    from /UE with the key-salt intermediate hash (zero IV, no padding)."""
    intermediate = _v5_hash(password, u[40:48], b"", r)
    return aes_cbc_decrypt(intermediate, bytes(16), ue, unpad=False)


def v5_make_u_ue(password: bytes, file_key: bytes, vsalt: bytes, ksalt: bytes) -> tuple[bytes, bytes]:
    """Writer side of Algorithm 8 (R6): build /U and /UE."""
    u = hash_2b(password, vsalt, b"") + vsalt + ksalt
    ue = aes_cbc_encrypt(hash_2b(password, ksalt, b""), bytes(16), file_key, pad=False)
    return u, ue


def v5_make_o_oe(password: bytes, file_key: bytes, u48: bytes, vsalt: bytes, ksalt: bytes) -> tuple[bytes, bytes]:
    """Writer side of Algorithm 9 (R6): /O and /OE bind to the full /U."""
    o = hash_2b(password, vsalt, u48) + vsalt + ksalt
    oe = aes_cbc_encrypt(hash_2b(password, ksalt, u48), bytes(16), file_key, pad=False)
    return o, oe


def v5_make_perms(p: int, file_key: bytes, encrypt_metadata: bool = True) -> bytes:
    """Algorithm 10: the 16-byte /Perms block, AES-256-ECB-encrypted."""
    blk = struct.pack("<i", p) + b"\xff\xff\xff\xff"
    blk += b"T" if encrypt_metadata else b"F"
    blk += b"adb" + bytes(4)
    return _enc_block(blk, _expand_key(file_key))


def decrypt_bytes_v5(file_key: bytes, data: bytes) -> bytes:
    """AES-256 content decryption: the FILE key is used directly (no
    per-object derivation in /V 5), IV leads the stream."""
    if len(data) < 16:
        raise ValueError("AES-encrypted PDF stream shorter than its IV")
    return aes_cbc_decrypt(file_key, data[:16], data[16:])


def encrypt_bytes_v5(file_key: bytes, data: bytes, iv: bytes) -> bytes:
    return iv + aes_cbc_encrypt(file_key, iv, data)


def decrypt_bytes(key: bytes, data: bytes, num: int, gen: int, aes: bool) -> bytes:
    ok = object_key(key, num, gen, aes)
    if not aes:
        return rc4(ok, data)
    if len(data) < 16:
        raise ValueError("AES-encrypted PDF stream shorter than its IV")
    return aes_cbc_decrypt(ok, data[:16], data[16:])


def encrypt_bytes(key: bytes, data: bytes, num: int, gen: int, aes: bool, iv: bytes | None = None) -> bytes:
    ok = object_key(key, num, gen, aes)
    if not aes:
        return rc4(ok, data)
    if iv is None:
        iv = hashlib.md5(b"doctr-spark-iv" + struct.pack("<ii", num, gen)).digest()
    return iv + aes_cbc_encrypt(ok, iv, data)
