"""Page-level language identification.

Reference `get_language` runs langdetect over the page's concatenated text
(`doctr/models/_utils.py:202-218`) and stores ``{value, confidence}`` on
the Page. The deterministic stand-in scores marker-token hits per language
(the same n-gram-heuristic family as operators/text_analysis.lang_id);
confidence is the winning language's share of marker hits.
"""

from __future__ import annotations

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "with", "for", "of", "a"),
    "es": ("el", "la", "de", "los", "que", "y"),
    "fr": ("le", "la", "les", "et", "des", "un"),
}
UNKNOWN = "unknown"


def get_language(text: str) -> tuple[str, float]:
    """Return (language, confidence) from whitespace-tokenized text."""
    tokens = text.lower().split()
    if not tokens:
        return UNKNOWN, 0.0
    hits = {lang: sum(t in markers for t in tokens) for lang, markers in LANG_MARKERS.items()}
    total = sum(hits.values())
    if total == 0:
        return UNKNOWN, 0.0
    best = max(sorted(hits), key=lambda k: hits[k])
    return best, hits[best] / total
