"""Sentence splitting, CJK-aware word counting and chunking.

Semantics replicate the reference exactly (byte-level chunk parity is a
correctness invariant — chunk boundaries feed extraction downstream):

* sentence split — reference src/knowledge_graph/text_utils.py:6-16
  (newline insertion after 。!?！？ / six dots / three dots / quote-closed
  sentence enders, then split + strip).
* word count — text_utils.py:18-24: whitespace-token count PLUS one per
  CJK char in U+4E00..U+9FFF (a token containing CJK is intentionally
  double-counted; chunk boundaries depend on this quirk).
* chunking — text_utils.py:26-87: paragraph-respecting, sentence-respecting
  accumulation to ``chunk_size`` "words" with a fixed carry-over of the
  last TWO sentences when ``overlap > 0`` (the overlap word-count value
  only gates whether carry-over happens at all); oversize sentences are
  emitted as standalone chunks with no carry.
* normalize — text_utils.py:89-117 (exported for API parity).
"""

from __future__ import annotations

import re

_CJK_RE = re.compile(r"[\u4e00-\u9fff]")

# Sentence-terminator newline inserters, applied in this exact order.
# NB the reference's quote classes are ASCII-only ("\"" and "'"): verified
# by byte inspection of text_utils.py:9,15 — no curly quotes.
_SENT_RULES = (
    (re.compile("([。!?！？])([^\"'])"), "\\1\n\\2"),
    (re.compile("(\\.{6})([^\"'])"), "\\1\n\\2"),
    (re.compile("(\\.{3})([^\"'])"), "\\1\n\\2"),
    (re.compile("([。!?！？][\"'])([^，。！？!?])"), "\\1\n\\2"),
)


_ENDER_SEARCH = re.compile("[。!?！？]")


def split_sentences(text: str) -> list[str]:
    """Split text into sentences (reference text_utils.py:6-16).

    The guards only skip rules that cannot match (rules 1/4 need a
    sentence ender, rules 2/3 need a "..." run), so output stays
    byte-identical to applying all four rules unconditionally — a no-op
    ``re.sub`` is identity but not free in the phase-1 hot loop."""
    r1, r6, r3, rq = _SENT_RULES
    if _ENDER_SEARCH.search(text):
        text = r1[0].sub(r1[1], text)
        if "..." in text:
            text = r6[0].sub(r6[1], text)
            text = r3[0].sub(r3[1], text)
        text = rq[0].sub(rq[1], text)
    elif "..." in text:
        text = r6[0].sub(r6[1], text)
        text = r3[0].sub(r3[1], text)
    return [s for s in (part.strip() for part in text.split("\n")) if s]


def count_words(text: str) -> int:
    """CJK-aware word count (reference text_utils.py:18-24)."""
    return len(text.split()) + len(_CJK_RE.findall(text))


def chunk_text(
    text: str,
    max_length: int = 100,
    overlap: int = 20,
    respect_sentences: bool = True,
    respect_paragraphs: bool = True,
) -> list[str]:
    """Chunk a document (reference text_utils.py:26-87, exact semantics).

    Returns the list of chunk strings; chunk ids are assigned 1-based by
    the caller (reference main.py:133-134).
    """
    if not text or not text.strip():
        return []

    if respect_paragraphs:
        paragraphs = [p for p in (q.strip() for q in text.split("\n\n")) if p]
    else:
        paragraphs = [text]

    chunks: list[str] = []
    acc: list[str] = []   # sentences of the chunk being built
    acc_len = 0
    carry: list[str] = []  # last-two-sentence overlap buffer

    for para in paragraphs:
        for sent in (split_sentences(para) if respect_sentences else [para]):
            n = count_words(sent)
            if n > max_length:
                # oversize sentence: flush accumulator, emit standalone
                if acc:
                    chunks.append(" ".join(acc))
                    carry = acc[-2:] if len(acc) >= 2 else acc
                chunks.append(sent)
                acc, acc_len = [], 0
                continue
            if acc_len + n > max_length and acc:
                chunks.append(" ".join(acc))
                carry = acc[-2:] if len(acc) >= 2 else acc
                acc = list(carry) if overlap > 0 else []
                acc_len = sum(count_words(s) for s in acc)
            acc.append(sent)
            acc_len += n

    if acc:
        chunks.append(" ".join(acc))
    return chunks


def normalize_text(text: str) -> str:
    """Text normalization (reference text_utils.py:89-117)."""
    if not text:
        return ""
    text = re.sub(r"[\r\n]+", "\n", text)
    text = re.sub(r"\s+", " ", text)
    text = re.sub(r"[\u200b\ufeff]", "", text)
    # reference text_utils.py:110-111 "unify quotes" use ASCII-only char
    # classes (verified by byte inspection) \u2192 literal no-ops; omitted.
    text = re.sub(r"\.{3,}", "...", text)
    text = re.sub(r"([。!?！？])\s*([^\"'\n])", r"\1 \2", text)
    return text.strip()


# --------------------------------------------------------------------------
# Traditional→Simplified conversion (S-6)
# --------------------------------------------------------------------------

# Character-level t2s: the engine-lexicon map below (exact for the zh
# relation lexicon of kernels/triple_extract.py ZH_RELATIONS, the zh
# function words the extractor trims, and the fixture vocabulary — no
# one-to-many ambiguity inside it) layered OVER the production-coverage
# single-character table in kernels/t2s_table.py (the ~2.4k-entry
# OpenCC-TSTCharacters-shaped subset), the inlined stand-in SURVEY §7.4
# allows for the reference's OpenCC pass (data_processor.py:47-62).
# Lexicon entries win on overlap so engine-critical conversions are
# pinned; corpora needing phrase-level disambiguation plug a real OpenCC
# instance into the same ``t2s_convert`` hook.
_T2S_LEXICON = str.maketrans({
    "進": "进", "動": "动", "發": "发", "設": "设", "強": "强", "資": "资",
    "擴": "扩", "勵": "励", "養": "养", "護": "护", "優": "优", "實": "实",
    "屬": "属", "於": "于", "帶": "带", "來": "来", "將": "将", "會": "会",
    "並": "并", "與": "与", "國": "国", "經": "经", "濟": "济", "體": "体",
    "學": "学", "區": "区", "關": "关", "係": "系", "電": "电", "網": "网",
    "環": "环", "報": "报", "時": "时", "間": "间", "機": "机", "構": "构",
    "條": "条", "專": "专", "業": "业", "創": "创", "辦": "办", "華": "华",
    "為": "为", "這": "这", "們": "们", "裡": "里", "後": "后", "點": "点",
    "說": "说", "對": "对", "開": "开", "門": "门", "見": "见", "長": "长",
    "車": "车", "貝": "贝", "頁": "页", "風": "风", "雲": "云", "萬": "万",
    "億": "亿", "計": "计", "劃": "划", "規": "规", "務": "务", "產": "产",
    "園": "园", "場": "场", "廠": "厂", "試": "试", "驗": "验", "術": "术",
    "數": "数", "據": "据", "標": "标", "準": "准", "連": "连", "運": "运",
})

from kgspark.kernels.t2s_table import T2S_EXTENDED, T2S_PHRASES  # noqa: E402

T2S_MAP: dict[int, str] = {**T2S_EXTENDED, **_T2S_LEXICON}

# longest-match-first alternation over the phrase keys: at any position
# the regex engine tries alternatives in listed order, so sorting by
# descending length makes 意味著 win over a shorter overlapping key
_T2S_PHRASE_RE = re.compile(
    "|".join(re.escape(k) for k in sorted(T2S_PHRASES, key=len, reverse=True)))

# Every phrase key contains at least one of these disambiguation
# characters (asserted in tests), so a page with none of them cannot
# match any phrase — seven C-level `in` scans gate the (much costlier)
# ~250-alternative regex search off the common path.
_T2S_TRIGGERS = "著藉覆甚乾瞭徵"


def t2s_convert(text: str) -> str:
    """Traditional→Simplified Chinese conversion (reference analog:
    data_processor.py:47-62 OpenCC t2s applied before chunking).

    Two layers, same shape as OpenCC: a longest-match phrase pass
    (``T2S_PHRASES`` — disambiguates one-to-many characters like
    乾/著/藉/徵/瞭 by context) whose matched spans bypass the character
    table, then the single-character pass over everything between
    matches."""
    if not text:
        return text
    if not any(c in text for c in _T2S_TRIGGERS):
        return text.translate(T2S_MAP)  # no trigger char → no phrase hit
    m = _T2S_PHRASE_RE.search(text)
    if m is None:
        return text.translate(T2S_MAP)
    out: list[str] = []
    pos = 0
    while m is not None:
        out.append(text[pos:m.start()].translate(T2S_MAP))
        out.append(T2S_PHRASES[m.group(0)])
        pos = m.end()
        m = _T2S_PHRASE_RE.search(text, pos)
    out.append(text[pos:].translate(T2S_MAP))
    return "".join(out)
