"""JSON recovery parser — API-parity port of the reference's tolerant
LLM-output parser (reference: src/knowledge_graph/llm.py:109-209).

Our extraction kernel returns structured lists, so nothing on the Spark
execution path needs this; it exists so prompt-template outputs captured
as text (the reference's interchange format) can be replayed, and so the
§2 operator inventory is complete.  Pure function, no I/O.

Recovery ladder (same order as the reference):
  1. strip ```json fences
  2. direct json.loads
  3. bracket-counted array extraction from surrounding prose
  4. repair unquoted keys and trailing commas, retry
  5. reconstruct a truncated array from its complete {...} objects
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)\s*```", re.S)
_UNQUOTED_KEY_RE = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)(\s*:)")
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")


def _strip_fences(text: str) -> str:
    m = _FENCE_RE.search(text)
    return m.group(1) if m else text


def _find_array(text: str) -> str | None:
    """Bracket-count the first balanced [...] span (string-aware)."""
    start = text.find("[")
    if start < 0:
        return None
    depth = 0
    in_str = False
    esc = False
    for i in range(start, len(text)):
        c = text[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def _repair(text: str) -> str:
    text = _UNQUOTED_KEY_RE.sub(r'\1"\2"\3', text)
    text = _TRAILING_COMMA_RE.sub(r"\1", text)
    return text


def _objects_of(text: str) -> list:
    """Salvage every complete {...} object from a truncated array body."""
    out = []
    depth = 0
    start = None
    in_str = False
    esc = False
    for i, c in enumerate(text):
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            if depth == 0:
                start = i
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0 and start is not None:
                try:
                    out.append(json.loads(_repair(text[start : i + 1])))
                except json.JSONDecodeError:
                    pass
                start = None
    return out


def extract_json_from_text(text: str):
    """Best-effort parse of a JSON array out of arbitrary LLM text.

    Returns the parsed list, or None when nothing recoverable exists
    (the reference returns None and logs)."""
    if not text:
        return None
    body = _strip_fences(text)
    for candidate in (body, _find_array(body)):
        if candidate is None:
            continue
        for attempt in (candidate, _repair(candidate)):
            try:
                parsed = json.loads(attempt)
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, list):
                return parsed
            return [parsed] if isinstance(parsed, dict) else None
    salvaged = _objects_of(body)
    return salvaged or None


_LINE_RE = re.compile(r"\s+-\s+")


def parse_line_triples(text: str) -> list[dict]:
    """Alt extraction output format: one ``subject - predicate - object``
    per line (reference: src/simple_graph.py:36-47).  Lines that don't
    split into exactly three non-empty parts are dropped."""
    out = []
    for line in (text or "").splitlines():
        parts = [p.strip() for p in _LINE_RE.split(line.strip())]
        if len(parts) == 3 and all(parts):
            out.append(
                {"subject": parts[0], "predicate": parts[1], "object": parts[2]}
            )
    return out
