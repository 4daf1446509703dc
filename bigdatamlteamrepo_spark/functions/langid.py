"""Heuristic language identification as a pure column expression.

Marker-word voting: for each candidate language, count tokens hitting
that language's high-frequency function-word list (public snowball
stopword sets); predict the argmax, 'und' (undetermined) when nothing
hits.  The standard cheap-LID baseline (fastText/CLD exist for quality;
this one is UDF-free, so it runs at scan speed inside codegen).

The driver's synthetic ``documents.lang`` column is uncorrelated with
its text (same vocabulary for every lang), so accuracy is asserted on a
constructed multilingual fixture in tests; over the driver corpus the
operator is registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: top function words per language (public snowball/frequency lists)
MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "they", "at", "this", "have", "from"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine",
           "ich", "sie", "den", "von", "zu", "des", "auf", "für", "im"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con",
           "para", "es", "su", "del", "se", "no", "más", "como", "pero"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "qui", "pour",
           "pas", "sur", "vous", "avec", "son", "ne", "ce", "il", "aux"],
    "zh": ["的", "是", "了", "在", "我", "有", "他", "这", "不", "们",
           "来", "上", "大", "个", "中", "到", "说", "就"],
}


#: languages written without word-separating whitespace — marker hits
#: are counted per CHARACTER over the raw text, since whitespace tokens
#: of unsegmented script never equal a single-char marker
CHAR_LANGS = {"zh"}


def _hits(tokens: Column, words: list[str]) -> Column:
    """Frequency-weighted marker hits (duplicates count — a text full of
    'the' is strong English evidence)."""
    marker = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(marker, t)))


def _char_hits(text: Column, chars: list[str]) -> Column:
    """Marker-character occurrence count over the raw text:
    Σ (length(text) − length(replace(text, c))) — expressible identically
    in DuckDB, so the zh path stays oracle-checkable."""
    total = F.lit(0)
    for c in chars:
        total = total + (F.length(text) - F.length(F.replace(text, F.lit(c), F.lit(""))))
    return total


def language_id(
    tokens: Column, *, text: Column | None = None, min_hits: int = 1
) -> Column:
    """Predicted language code ('und' if no markers hit).

    Whitespace-tokenized languages vote per token; ``CHAR_LANGS`` vote
    per character over ``text`` (pass the raw text column to enable the
    unsegmented-script path — without it those languages score 0).
    Ties break toward the lexicographically larger code (struct max),
    deterministically in both engines.
    """
    scores = []
    for lang, ws in MARKERS.items():
        if lang in CHAR_LANGS and text is not None:
            score = _char_hits(text, ws)
        else:
            # token voting (for CHAR_LANGS this only matches
            # pre-segmented text; pass ``text`` for the real char path)
            score = _hits(tokens, ws)
        scores.append((score.cast("long"), lang))
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for score, lang in scores
        ]
    )
    best = F.array_max(pairs)  # struct ordering: by score, then lang
    return F.when(best["score"] >= min_hits, best["lang"]).otherwise(F.lit("und"))


def language_id_sql(text_sql: str, toks_sql: str, min_hits: int = 1) -> str:
    """DuckDB oracle twin of :func:`language_id` (struct-max argmax with
    the same tie-break)."""
    structs = []
    for lang, ws in MARKERS.items():
        if lang in CHAR_LANGS:
            terms = " + ".join(
                f"(length({text_sql}) - length(replace({text_sql}, '{c}', '')))"
                for c in ws
            )
            score = f"CAST({terms} AS BIGINT)"
        else:
            lst = "[" + ", ".join(f"'{w}'" for w in ws) + "]"
            score = f"CAST(len(list_filter({toks_sql}, t -> list_contains({lst}, t))) AS BIGINT)"
        structs.append(f"{{'score': {score}, 'lang': '{lang}'}}")
    arr = "[" + ",\n       ".join(structs) + "]"
    return (
        f"CASE WHEN list_max({arr}).score >= {min_hits} "
        f"THEN list_max({arr}).lang ELSE 'und' END"
    )
