"""Deterministic trafilatura-style HTML → text extraction kernel.

Role mirror of the reference's extract→clean contract
(/root/reference/data_processor.py:88-119 XML walk + :64-86 cleanup): strip
boilerplate containers, keep block-level content text, normalize whitespace.
Pure function of the HTML bytes — byte-identical output per url across
reruns and parallelism levels is the pipeline's per-row invariant.

The kernel is regex-based (no external HTML parser in the image) and is
applied batched over a ``pd.Series`` of binary values inside an Arrow UDF
(kgspark.pipeline.ingest.extract_text_udf).
"""

from __future__ import annotations

import html as _html
import re

# Containers whose entire subtree is boilerplate (trafilatura's discard list).
_DISCARD = ("script", "style", "nav", "header", "footer", "aside", "form", "noscript")
_DISCARD_RE = re.compile(
    r"<(%s)\b[^>]*>.*?</\1\s*>" % "|".join(_DISCARD), re.S | re.I
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.S | re.I)
# Block-level elements that terminate a text run → paragraph breaks.
_BLOCK_RE = re.compile(
    r"</?(p|div|h[1-6]|li|ul|ol|table|tr|br|blockquote|section|article|pre)\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
# Reference cleanup chain (data_processor.py:64-86): page headers/footers,
# rules, blank-line collapse.
_PAGE_MARK_RE = re.compile(r"^\s*(第\s*\d+\s*页|Page\s+\d+)\s*$", re.M)
_RULE_RE = re.compile(r"^\s*[-=]{3,}\s*$", re.M)


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """Extract boilerplate-free text from raw page bytes.

    Paragraph structure is preserved as ``\\n\\n`` separators (the chunker
    splits on those — reference text_utils.py:46).
    """
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", raw)
    s = _HEAD_RE.sub(" ", s)
    # iterate: nested discard containers
    prev = None
    while prev != s:
        prev = s
        s = _DISCARD_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _PAGE_MARK_RE.sub("", s)
    s = _RULE_RE.sub("", s)
    # per-paragraph whitespace collapse, then drop empties
    paras = []
    for p in s.split("\n\n"):
        p = re.sub(r"\s+", " ", p).strip()
        if p:
            paras.append(p)
    return "\n\n".join(paras)


def render_page(text: str, title: str = "", lang: str = "en") -> bytes:
    """Inverse fixture builder: wrap plain text in a boilerplated HTML page
    such that ``extract_text(render_page(t)) == t`` for well-formed t
    (FIXTURES.md T1 html generation rule).  Used by kgspark.datagen and
    tests only — not part of the engine path.
    """
    body = "\n".join(
        f"<p>{_html.escape(p)}</p>" for p in text.split("\n\n") if p.strip()
    )
    page = (
        f'<html lang="{lang}"><head><title>{_html.escape(title)}</title>'
        "<style>body{margin:0}</style>"
        '<script>var t=1;</script></head>'
        "<body><nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>"
        "<header><h1>site banner</h1></header>"
        f"<article>{body}</article>"
        "<aside>related links boilerplate</aside>"
        "<footer>© example.org — all rights reserved</footer>"
        "</body></html>"
    )
    return page.encode("utf-8")
