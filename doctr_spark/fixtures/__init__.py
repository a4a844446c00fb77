"""Deterministic synthetic-input generators (seeded, no external data).

Mirrors the reference's fixture strategy (`/root/reference/tests/conftest.py`
builds synthetic pages with `synthesize_text_img`); here the page renderer is
the glyph font and a deterministic layout engine, so every generated page
carries exact ground truth for detection boxes, recognition strings, and the
final `Document.render()` text.
"""
