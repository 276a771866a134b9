"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure JVM column expressions (whole-stage
codegen; SQL-oracle-replayable) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language function-word lexicons for the stopword-vote heuristic
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "an", "of", "and", "is", "to", "in", "that", "it"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "dans"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "en"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
}
LANG_ORDER = ["en", "fr", "es", "de"]  # tie-break priority

EN_STOPWORDS = LANG_LEXICONS["en"]


def words_lower(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def cjk_char_count(col: Column) -> Column:
    """Count of CJK chars (reference CJK range 一-鿿,
    /root/reference/src/knowledge_graph/text_utils.py:22)."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[一-鿿]", ""))


def langid_expr(col: Column, cjk_ratio_threshold: float = 0.05) -> Column:
    """Heuristic language-ID: CJK char ratio → 'zh'; else argmax of
    function-word hits over per-language lexicons (ties → LANG_ORDER)."""
    ws = words_lower(col)
    hits = {
        lang: F.size(F.array_intersect(F.array_distinct(ws), F.array(*[F.lit(w) for w in lex])))
        for lang, lex in LANG_LEXICONS.items()
    }
    best = F.lit(LANG_ORDER[-1])
    best_hits = hits[LANG_ORDER[-1]]
    for lang in reversed(LANG_ORDER[:-1]):
        cond = hits[lang] >= best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    cjk_ratio = cjk_char_count(col) / F.greatest(F.length(col), F.lit(1))
    return F.when(cjk_ratio > cjk_ratio_threshold, F.lit("zh")).otherwise(best)


def ws_token_count(col: Column) -> Column:
    """Whitespace tokenization count (str.split() semantics)."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda w: w != ""))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, single
    punctuation marks (GPT-2 pre-tokenizer shape, simplified)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Per-doc quality features + composite score in [0,1]:

      n_chars, n_words, avg_word_len, stopword_ratio, punct_ratio,
      uniq_word_ratio, score

    Score: docs with mid-length words, some stopwords, low punctuation and
    diverse vocabulary rank higher (C4/Gopher-style length+repetition
    heuristics, deterministic and SQL-replayable).
    """
    ws = words_lower(F.col(text_col))
    n_words = F.size(ws)
    n_chars = F.length(F.col(text_col))
    avg_wl = F.round(
        (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1)), 4
    )
    stop_ratio = F.round(
        F.size(F.filter(ws, lambda w: w.isin(EN_STOPWORDS)))
        / F.greatest(n_words, F.lit(1)),
        4,
    )
    punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 4)
    uniq_ratio = F.round(
        F.size(F.array_distinct(ws)) / F.greatest(n_words, F.lit(1)), 4
    )
    # round at 6dp: the inputs are 4dp values scaled by 0.25, so the result
    # is an exact 6-decimal number — no cross-engine rounding-boundary risk
    score = F.round(
        F.lit(0.25) * F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.0)
        + F.lit(0.25) * F.when((avg_wl >= 3) & (avg_wl <= 10), 1.0).otherwise(0.0)
        + F.lit(0.25) * F.when(stop_ratio >= 0.05, 1.0).otherwise(0.0)
        + F.lit(0.25) * uniq_ratio,
        6,
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        avg_wl.alias("q_avg_word_len"),
        stop_ratio.alias("q_stopword_ratio"),
        punct_ratio.alias("q_punct_ratio"),
        uniq_ratio.alias("q_uniq_ratio"),
        score.alias("q_score"),
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 shape):
# a doc is kept when every signal is at or below its cap.
GOPHER_CAPS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_frac": 0.30,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
}


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       ngram_ns: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """Gopher/RefinedWeb repetition quality signals, one row per doc:

      dup_line_frac       repeated line occurrences / total lines
      dup_line_char_frac  chars in repeat occurrences (beyond each
                          line's first) / total line chars
      dup_para_frac       same as dup_line_frac over blank-line-split
                          paragraphs
      top{n}_char_frac    chars covered by the single most frequent
                          word n-gram / total doc chars, for each n

    Repetition-heavy pages (boilerplate, templated spam, scraper loops)
    are the classic pre-training poison these caps filter (see
    GOPHER_CAPS / ``gopher_keep``).

    Scale shape: each signal family is explode → groupBy(id, token) →
    groupBy(id) — partial aggregation combines map-side, keys carry the
    doc id so nothing is corpus-global; no Python, no windows.  Empty
    docs yield zeros.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    doc_chars = base.select(
        "_id", F.greatest(F.length("_text"), F.lit(1)).alias("_n"),
        F.coalesce(
            F.size(F.filter(F.split("_text", r"\s+"), lambda w: w != "")),
            F.lit(0),
        ).alias("_nw"),
    )

    def _dup_frac(split_pat: str, out_frac: str, out_char_frac: str | None):
        toks = base.select(
            "_id",
            F.explode(
                F.filter(
                    F.transform(F.split("_text", split_pat), lambda l: F.trim(l)),
                    lambda l: l != "",
                )
            ).alias("tok"),
        )
        per_tok = toks.groupBy("_id", "tok").agg(F.count("*").alias("c"))
        aggs = [
            F.round(
                F.sum(F.col("c") - 1) / F.greatest(F.sum("c"), F.lit(1)), 6
            ).alias(out_frac)
        ]
        if out_char_frac:
            aggs.append(
                F.round(
                    F.sum((F.col("c") - 1) * F.length("tok"))
                    / F.greatest(F.sum(F.col("c") * F.length("tok")), F.lit(1)),
                    6,
                ).alias(out_char_frac)
            )
        return per_tok.groupBy("_id").agg(*aggs)

    out = doc_chars.join(
        _dup_frac(r"\n", "dup_line_frac", "dup_line_char_frac"), "_id", "left"
    ).join(_dup_frac(r"\n\s*\n", "dup_para_frac", None), "_id", "left")

    words = F.filter(F.split(F.lower("_text"), r"\s+"), lambda w: w != "")
    for n in ngram_ns:
        grams = base.select(
            "_id",
            F.explode(
                F.when(
                    F.size(words) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(words) - (n - 1)),
                        lambda i: F.array_join(F.slice(words, i, n), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
        # argmax by (count, gram length, gram) — deterministic tie-break
        top = (
            grams.groupBy("_id", "g").agg(F.count("*").alias("c"))
            .groupBy("_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), F.length("g").alias("l"), F.col("g")
                    )
                ).alias("t")
            )
            .select("_id", (F.col("t.c") * F.col("t.l")).alias(f"_top{n}"))
        )
        out = out.join(top, "_id", "left")

    sel = [
        F.col("_id").alias(id_col),
        F.col("_nw").alias("n_words"),
        *[
            F.coalesce(c, F.lit(0.0)).alias(c)
            for c in ("dup_line_frac", "dup_line_char_frac", "dup_para_frac")
        ],
        *[
            F.round(
                F.coalesce(F.col(f"_top{n}"), F.lit(0)) / F.col("_n"), 6
            ).alias(f"top{n}_char_frac")
            for n in ngram_ns
        ],
    ]
    return out.select(*sel)


def gopher_keep(caps: dict[str, float] | None = None,
                min_words: int | None = None) -> Column:
    """Boolean keep-column over ``repetition_signals`` output: every
    signal at or below its cap (defaults: GOPHER_CAPS).

    ``min_words`` exempts documents below that word count from the
    caps entirely: the char-fraction signals assume real-document
    lengths (on a clean 6-word page a single 2-gram is trivially >20%
    of all chars), and Gopher itself applies its repetition caps only
    downstream of a 50-word minimum-length rule — a KG pipeline keeps
    short pages rather than discarding them, so the exemption replaces
    the removal."""
    caps = caps or GOPHER_CAPS
    cond = F.lit(True)
    for name, cap in caps.items():
        cond = cond & (F.col(name) <= F.lit(cap))
    if min_words is not None:
        cond = (F.col("n_words") < F.lit(min_words)) | cond
    return cond


def fingerprint_expr(col: Column, n: int = 8) -> Column:
    """Winnowing-style document fingerprint: minimum md5 over word
    n-gram shingles (md5 → portable across engines).  Equal fingerprints
    imply a shared minimal shingle — cheap near-dup prefilter."""
    words = F.filter(F.split(col, r"\s+"), lambda w: w != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.array_min(F.transform(grams, F.md5))
