"""Export formats over the built page dict (reference
`/root/reference/doctr/io/exporters.py`).

The reference exporters first linearize the page in reading order
(`exporters.py:92-216`) and then string-fold with per-format escaping. Our
builder already emits blocks/lines in reading order (single-column straight
pages — the rotated/multi-column reading-order pass is a later round), so
each exporter here is the string fold with the reference's separators and
escaping rules:

* text     — words " ", lines "\\n", blocks "\\n\\n", pages "\\n\\n\\n\\n"
             (`exporters.py:416-433`)
* markdown — markdown-escaped text, line-marker neutralization, page break
             "\\n\\n---\\n\\n" (`exporters.py:436-471`)
* html     — escaped text, <p> per block with <br> between lines, page
             break "\\n<hr>\\n" (`exporters.py:512-609`)
* hocr     — hOCR XML with absolute-pixel bboxes per word/line/block
             (`exporters.py:643-908`)

Everything is a pure function of the page dict -> string, so the Spark
operator is a thin Arrow-batched map.
"""

from __future__ import annotations

import html as _html
from typing import Any

_MD_SPECIAL = set("\\`*_{}[]()#+.!|<>")
_MD_LINE_MARKERS = set("-+*>#")


def _md_escape(text: str) -> str:
    return "".join(f"\\{c}" if c in _MD_SPECIAL else c for c in text)


def _md_finalize_line(line: str) -> str:
    stripped = line.lstrip()
    if stripped and (stripped[0] in _MD_LINE_MARKERS or stripped.split(" ")[0].rstrip(".").isdigit()):
        return f"\\{line}" if line[0] != "\\" else line
    return line


_FURNITURE_ROLES = ("header", "footer", "footnote")


def _content_blocks(page: dict[str, Any], include_furniture: bool) -> list[dict[str, Any]]:
    """Reference `include_furniture` semantics (`exporters.py:346-347`):
    blocks whose layout label ranks as page header / footer / footnote are
    skipped from the render when the flag is off. Labels come from the
    layout-aware builder (`build_page(..., layout_regions=...)`); unlabeled
    blocks are body content and always render."""
    blocks = page["blocks"]
    if include_furniture:
        return blocks
    from .reading_order import _ROLE_BY_LABEL

    return [
        b
        for b in blocks
        if _ROLE_BY_LABEL.get((b.get("layout_label") or "").lower(), "body")
        not in _FURNITURE_ROLES
    ]


def export_text(page: dict[str, Any], include_furniture: bool = True) -> str:
    return "\n\n".join(
        "\n".join(" ".join(w["value"] for w in line["words"]) for line in block["lines"])
        for block in _content_blocks(page, include_furniture)
    )


def export_markdown(page: dict[str, Any], include_furniture: bool = True) -> str:
    parts = []
    for block in _content_blocks(page, include_furniture):
        lines = [
            _md_finalize_line(" ".join(_md_escape(w["value"]) for w in line["words"]))
            for line in block["lines"]
        ]
        parts.append("\n".join(lines))
    return "\n\n".join(parts)


def export_html(page: dict[str, Any], include_furniture: bool = True) -> str:
    blocks = []
    for block in _content_blocks(page, include_furniture):
        lines = [
            _html.escape(" ".join(w["value"] for w in line["words"]), quote=False)
            for line in block["lines"]
        ]
        blocks.append("<p>" + "<br>".join(lines) + "</p>")
    return "\n".join(blocks)


def _hocr_bbox(geom: list[float], dims: list[int]) -> str:
    h, w = dims
    x0, y0, x1, y1 = geom
    return f"bbox {round(x0 * w)} {round(y0 * h)} {round(x1 * w)} {round(y1 * h)}"


def export_hocr(page: dict[str, Any]) -> str:
    """hOCR body fragment: ocr_page > ocr_carea > ocr_line > ocrx_word with
    pixel bboxes and confidences (`exporters.py:625-640` bbox formatting)."""
    h, w = page["dimensions"]
    out = [
        f"<div class='ocr_page' id='page_{page['page_idx'] + 1}' "
        f"title='image; bbox 0 0 {w} {h}; ppageno {page['page_idx']}'>"
    ]
    for bi, block in enumerate(page["blocks"]):
        out.append(
            f"<div class='ocr_carea' id='block_{bi}' "
            f"title='{_hocr_bbox(block['geometry'], page['dimensions'])}'>"
        )
        for li, line in enumerate(block["lines"]):
            out.append(
                f"<span class='ocr_line' id='line_{bi}_{li}' "
                f"title='{_hocr_bbox(line['geometry'], page['dimensions'])}'>"
            )
            for wi, word in enumerate(line["words"]):
                conf = round(100 * word["confidence"])
                out.append(
                    f"<span class='ocrx_word' id='word_{bi}_{li}_{wi}' "
                    f"title='{_hocr_bbox(word['geometry'], page['dimensions'])}; x_wconf {conf}'>"
                    f"{_html.escape(word['value'], quote=False)}</span>"
                )
            out.append("</span>")
        out.append("</div>")
    out.append("</div>")
    return "\n".join(out)


_ADOC_SPECIAL = set("*_`#+|")
_ADOC_LINE_MARKERS = set("*.-=")


def export_asciidoc(page: dict[str, Any], include_furniture: bool = True) -> str:
    """AsciiDoc export (`exporters.py:474-509`): escaped text, line-marker
    neutralization via {empty}, page break "\\n\\n<<<\\n\\n"."""
    parts = []
    for block in _content_blocks(page, include_furniture):
        lines = []
        for line in block["lines"]:
            text = " ".join(
                "".join(f"\\{c}" if c in _ADOC_SPECIAL else c for c in w["value"])
                for w in line["words"]
            )
            stripped = text.lstrip()
            if stripped and stripped[0] in _ADOC_LINE_MARKERS:
                text = "{empty}" + text
            lines.append(text)
        parts.append("\n".join(lines))
    return "\n\n".join(parts)


EXPORTERS = {
    "text": export_text,
    "markdown": export_markdown,
    "asciidoc": export_asciidoc,
    "html": export_html,
    "hocr": export_hocr,
}

PAGE_BREAKS = {
    "text": "\n\n\n\n",
    "markdown": "\n\n---\n\n",
    "asciidoc": "\n\n<<<\n\n",
    "html": "\n<hr>\n",
    "hocr": "\n",
}
