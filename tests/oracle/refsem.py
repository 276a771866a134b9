"""Reference-semantics oracle for phases 2-3 (test-only, never on the
Spark execution path).

Row-at-a-time reimplementation of the reference's deterministic phases:

* predicate limiting   — /root/reference/src/knowledge_graph/entity_standardization.py:14-38
* entity standardization — entity_standardization.py:40-188 (LLM branch off)
* relationship inference — entity_standardization.py:190-755 (LLM branches off):
  transitive (:321-361), lexical similarity (:664-755), dedup (:363-382),
  final predicate limit + self-loop filter (:268-275)

Where the reference's output depends on Python hash order (set iteration /
dict insertion), this oracle pins a canonical total order, and the Spark
engine pins the SAME order — the deviations are:

  D1 second-pass standard-form scan order: sorted by (len, lexical)
     [reference :128 sorts by len only; ties = set-iteration order]
  D2 lexical-inference entity pair enumeration: sorted lexical order
     [reference :685 uses list(set) order]
  D3 shared-word pick: longest, ties → lexicographically smallest
     [reference :713 max(set, key=len) — first max in set order]
"""

from __future__ import annotations

PRED_STOP = {"a", "an", "the", "of", "with", "by", "to", "from", "in", "on", "for"}
NORM_STOP = {
    "the", "a", "an", "of", "and", "or", "in", "on", "at", "to",
    "for", "with", "by", "as",
}

import re


def limit_predicate(pred: str, max_words: int = 3) -> str:
    ws = pred.split()
    if len(ws) <= max_words:
        return pred
    kept = ws[:max_words]
    if kept[-1].lower() in PRED_STOP and len(ws) > 1:
        kept = kept[:-1]
    return " ".join(kept)


def _norm_key(ent: str) -> str:
    toks = re.findall(r"\b\w+\b", ent.lower())
    return " ".join(t for t in toks if t not in NORM_STOP)


def standardize(triples: list[dict]) -> list[dict]:
    """Phase 2 with use_llm_for_entities=False."""
    rows = [
        t for t in triples
        if isinstance(t, dict) and "subject" in t and "predicate" in t and "object" in t
    ]
    if not rows:
        return []

    ents = set()
    for t in rows:
        ents.add(t["subject"].lower())
        ents.add(t["object"].lower())

    groups: dict[str, list[str]] = {}
    for e in sorted(ents, key=lambda x: (-len(x), x)):
        k = _norm_key(e)
        if k:
            groups.setdefault(k, []).append(e)

    mapping: dict[str, str] = {}
    for variants in groups.values():
        if len(variants) == 1:
            mapping[variants[0]] = variants[0]
            continue
        counts = {v: 0 for v in variants}
        for t in rows:
            for v in variants:
                if t["subject"].lower() == v:
                    counts[v] += 1
                if t["object"].lower() == v:
                    counts[v] += 1
        std = sorted(variants, key=lambda x: (-counts[x], len(x)))[0]
        for v in variants:
            mapping[v] = std

    # second pass: subset / shared-stem merges over standard forms (D1)
    forms = sorted(set(mapping.values()), key=lambda x: (len(x), x))
    extra: dict[str, str] = {}
    for i, e1 in enumerate(forms):
        w1 = set(e1.split())
        for e2 in forms[i + 1:]:
            w2 = set(e2.split())
            if w1 and w1.issubset(w2):
                extra[e2] = e1
            elif w2 and w2.issubset(w1):
                extra[e1] = e2
            else:
                s1 = {w[:4] for w in w1 if len(w) > 4}
                s2 = {w[:4] for w in w2 if len(w) > 4}
                shared = s1 & s2
                if shared and len(shared) / max(len(s1), len(s2)) > 0.5:
                    # len(e1) <= len(e2) always holds under (len, lex) order
                    extra[e2] = e1
    for ent, std in extra.items():
        mapping[ent] = std

    out = []
    for t in rows:
        out.append({
            "subject": mapping.get(t["subject"].lower(), t["subject"]),
            "predicate": limit_predicate(t["predicate"]),
            "object": mapping.get(t["object"].lower(), t["object"]),
            "chunk": t.get("chunk", 0),
        })
    return [t for t in out if t["subject"] != t["object"]]


def _transitive(rows: list[dict]) -> list[dict]:
    """entity_standardization.py:321-361; last predicate per (s,o) wins."""
    pred_of: dict[tuple, str] = {}
    for t in rows:
        pred_of[(t["subject"], t["object"])] = t["predicate"]
    adj: dict[str, set] = {}
    for t in rows:
        adj.setdefault(t["subject"], set()).add(t["object"])
    new = []
    for a in sorted(adj):
        for b in sorted(adj[a]):
            for c in sorted(adj.get(b, ())):
                if a != c and (a, c) not in pred_of:
                    p1 = pred_of.get((a, b), "relates to")
                    p2 = pred_of.get((b, c), "relates to")
                    np = f"indirectly {p1}" if p1 == p2 else f"{p1} via {b}"
                    new.append({
                        "subject": a,
                        "predicate": limit_predicate(np),
                        "object": c,
                        "inferred": True,
                    })
    return new


def _lexical(entities: set, rows: list[dict]) -> list[dict]:
    """entity_standardization.py:664-755 over sorted entities (D2/D3)."""
    existing = {(t["subject"], t["object"]) for t in rows}
    ents = sorted(entities)
    new = []
    for i, e1 in enumerate(ents):
        for e2 in ents[i + 1:]:
            if (e1, e2) in existing or (e2, e1) in existing:
                continue
            l1, l2 = e1.lower(), e2.lower()
            shared = set(l1.split()) & set(l2.split())
            if shared:
                main = max(sorted(shared), key=len)  # D3
                if len(main) >= 4:
                    if l1.startswith(main) and not l2.startswith(main):
                        new.append({"subject": e2, "predicate": "relates to",
                                    "object": e1, "inferred": True})
                    elif l2.startswith(main) and not l1.startswith(main):
                        new.append({"subject": e1, "predicate": "relates to",
                                    "object": e2, "inferred": True})
                    else:
                        new.append({"subject": e1, "predicate": "related to",
                                    "object": e2, "inferred": True})
            elif l1 in l2:
                new.append({"subject": e2, "predicate": "is type of",
                            "object": e1, "inferred": True})
            elif l2 in l1:
                new.append({"subject": e1, "predicate": "is type of",
                            "object": e2, "inferred": True})
    return new


def _dedup(rows: list[dict]) -> list[dict]:
    """entity_standardization.py:363-382: later non-inferred overwrites."""
    uniq: dict[tuple, dict] = {}
    for t in rows:
        k = (t["subject"], t["predicate"], t["object"])
        if k not in uniq or not t.get("inferred", False):
            uniq[k] = t
    return list(uniq.values())


def infer(triples: list[dict]) -> list[dict]:
    """Phase 3 with use_llm_for_inference=False."""
    if not triples or len(triples) < 2:  # reference :201-202 pre-validation
        return list(triples)
    rows = [
        t for t in triples
        if isinstance(t, dict) and "subject" in t and "predicate" in t and "object" in t
    ]
    if not rows:
        return []
    ents = set()
    for t in rows:
        ents.add(t["subject"])
        ents.add(t["object"])
    combined = list(rows) + _transitive(rows) + _lexical(ents, rows)
    final = _dedup(combined)
    for t in final:
        t["predicate"] = limit_predicate(t["predicate"])
    return [t for t in final if t["subject"] != t["object"]]


def canon(rows: list[dict]) -> set:
    """Canonical comparable form: (s, p, o, inferred)."""
    return {
        (t["subject"], t["predicate"], t["object"], bool(t.get("inferred", False)))
        for t in rows
    }
