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


def _hits(tokens: Column, words: list[str]) -> Column:
    """Frequency-weighted marker hits (duplicates count — a text full of
    'the' is strong English evidence)."""
    marker = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(marker, t)))


def language_id(tokens: Column, min_hits: int = 1) -> Column:
    """Predicted language code from a token array ('und' if no markers)."""
    scores = [(_hits(tokens, ws).alias(lang), lang) for lang, ws in MARKERS.items()]
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for score, lang in scores
        ]
    )
    best = F.array_max(pairs)  # struct ordering: by score, then lang
    return F.when(best["score"] >= min_hits, best["lang"]).otherwise(F.lit("und"))
