"""Payload embedding + decoding for transcript ``text`` fields.

Three payload kinds, mirroring the reference's DocumentFile entry points
(`/root/reference/doctr/io/reader.py`):

* ``<doc:html>...</doc:html>``  — an HTML fragment; decode = DOM heuristics
  (boilerplate strip of header/footer/nav/script/style, block-element text
  extraction) + the deterministic layout engine. Stand-in for
  `DocumentFile.from_url` (html->weasyprint->pdf, `doctr/io/html.py:11-26`)
  and the north rule's "HTML boilerplate strip / DOM heuristics".
* ``<doc:img>BASE64</doc:img>`` — one packed page image
  (`DocumentFile.from_images`, `doctr/io/image/base.py:16-54`).
* ``<doc:pdf>BASE64</doc:pdf>`` — packed multi-page document
  (`DocumentFile.from_pdf`, `doctr/io/pdf.py:16-43`).

All decoding is vectorizable per turn inside Arrow UDF batches.
"""

from __future__ import annotations

import base64
import re

import numpy as np

from ..kernels.imgcodec import decode_multipage, decode_page, encode_multipage, encode_page
from .layout import layout_paragraphs

PAYLOAD_MARK = "<doc:"
_PAYLOAD_RE = re.compile(r"<doc:(html|img|pdf)>(.*?)</doc:\1>", re.DOTALL)

# DOM heuristics: furniture elements stripped before text extraction
# (analogue of the reference's furniture filter, doctr/io/exporters.py:346-347)
_BOILERPLATE_RE = re.compile(
    r"<(header|footer|nav|script|style|aside)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_RE = re.compile(
    r"<(p|h1|h2|h3|li|td|div)\b([^>]*)>(.*?)</\1>", re.DOTALL | re.IGNORECASE
)
# class/id furniture: the readability/jusText-style attribute heuristic —
# blocks tagged as chrome are boilerplate whatever their element is
_FURNITURE_ATTR_RE = re.compile(
    r'(?:class|id)\s*=\s*"[^"]*'
    r"(?:nav|menu|sidebar|footer|header|banner|cookie|advert|\bads?\b|social|promo)"
    r'[^"]*"',
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")


def make_html_payload(
    paragraphs: list[list[str]], with_boilerplate: bool = True, clutter: int = 0
) -> str:
    """``clutter`` grades the page up toward real-web markup: 1 adds HTML
    comments (including a commented-out block that must NOT extract) and
    class/id-tagged furniture divs; 2 additionally entity-encodes the
    first character of every word (&#NN;) and joins some words with
    &nbsp; — the decoder must unescape to recover the text."""

    def enc(words: list[str]) -> str:
        if clutter < 2:
            return " ".join(words)
        out = [f"&#{ord(w[0])};{w[1:]}" for w in words]
        sep = "&nbsp;" if len(out) > 1 else " "
        return out[0] + sep + " ".join(out[1:])

    body = "".join(f"<p>{enc(words)}</p>" for words in paragraphs)
    if clutter >= 1:
        body = (
            '<!-- build 1234 --><!-- <p>commented out text</p> -->'
            '<div class="sidebar related"><li>related links</li></div>'
            '<p><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></p>'
            + body
            + '<div id="cookie-banner"><p>accept all cookies</p></div>'
            '<td class="social-share">share buttons</td>'
        )
    if with_boilerplate:
        body = (
            "<header>site nav chrome</header><nav><li>home</li></nav>"
            + body
            + "<footer>copyright footer</footer>"
        )
    return f"<doc:html><html><body>{body}</body></html></doc:html>"


def make_img_payload(page: np.ndarray, codec: str = "zlib") -> str:
    """Pack a page as an img payload; ``codec="png"`` writes a real PNG
    stream (decoded by the pure-stdlib `kernels.png` codec)."""
    if codec == "png":
        from ..kernels.png import encode_png

        blob = encode_png(page)
    else:
        blob = encode_page(page)
    return "<doc:img>" + base64.b64encode(blob).decode("ascii") + "</doc:img>"


def make_pdf_payload(pages: list[np.ndarray]) -> str:
    return "<doc:pdf>" + base64.b64encode(encode_multipage(pages)).decode("ascii") + "</doc:pdf>"


def strip_boilerplate(html: str) -> str:
    """Drop furniture subtrees (header/footer/nav/aside/script/style)."""
    prev = None
    while prev != html:
        prev = html
        html = _BOILERPLATE_RE.sub("", html)
    return html


def html_to_paragraphs(html: str) -> list[list[str]]:
    """Main-content extraction: comments out first (a commented-out block
    must not extract), furniture subtrees stripped, class/id-tagged chrome
    blocks dropped, block elements -> entity-unescaped words."""
    import html as _html

    html = _COMMENT_RE.sub("", html)
    html = strip_boilerplate(html)
    paragraphs = []
    for _tag, attrs, inner in _BLOCK_RE.findall(html):
        if _FURNITURE_ATTR_RE.search(attrs):
            continue
        text = _html.unescape(_TAG_RE.sub(" ", inner))
        words = text.split()
        if not words:
            continue
        # link-density heuristic (jusText-style): a short block that is
        # mostly anchors is navigation, not content
        n_links = len(re.findall(r"<a\b", inner, re.IGNORECASE))
        if n_links >= 2 and len(words) < 3 * n_links:
            continue
        paragraphs.append(words)
    return paragraphs


def decode_payload(text: str) -> list[np.ndarray]:
    """Extract and decode every payload in a turn's text -> list of pages."""
    pages: list[np.ndarray] = []
    for kind, body in _PAYLOAD_RE.findall(text):
        if kind == "html":
            paragraphs = html_to_paragraphs(body)
            pages.extend(p.canvas for p in layout_paragraphs(paragraphs))
        elif kind == "img":
            pages.append(decode_page(base64.b64decode(body)))
        else:  # pdf
            blob = base64.b64decode(body)
            if blob[:5] == b"%PDF-":
                # REAL %PDF input: the from-scratch PDF text codec
                # (`kernels.pdf`, written against the public PDF 1.4 spec
                # like the MAT v5 codec) parses the page tree + content
                # streams (raw or FlateDecode) and rasterizes every text
                # operator in the glyph font. PDFs beyond the subset
                # (encryption, exotic filters) still fail LOUDLY inside
                # the codec — the disclosed gate narrowed, not removed;
                # the pypdfium2 swap-in point (doctr/io/pdf.py:16-43)
                # stays this branch.
                from ..kernels.pdf import rasterize_pdf

                pages.extend(rasterize_pdf(blob))
            else:
                pages.extend(decode_multipage(blob))
    return pages
