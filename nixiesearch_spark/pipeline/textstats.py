"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (JVM-side, whole-stage codegen — zero Python
in the hot path), so they run unchanged over 100 TB: token counting,
quality scoring, language-ID heuristic, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker stopwords for the n-gram-free lang-ID heuristic;
# deterministic and cheap — regexp_count exists in both Spark and DuckDB,
# so the same rule doubles as the correctness oracle.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def whitespace_token_count(text: Column) -> Column:
    """Tokens = maximal non-whitespace runs."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0))


def word_token_count(text: Column) -> Column:
    """BPE-ish: word chars runs + each punctuation char counts as one token."""
    words = F.size(F.filter(F.split(text, r"\W+"), lambda t: F.length(t) > 0))
    punct = F.length(F.regexp_replace(text, r"[\w\s]+", ""))
    return words + punct


def punct_ratio(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, r"[\w\s]+", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: F.length(t) > 0)
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favor medium length, low punct
    noise, non-trivial stopword presence (natural-language-ness)."""
    n = F.length(text)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return (len_score + punct_pen + stop_score) / 3.0


def lang_id(text: Column) -> Column:
    """Marker-stopword language ID: per-language score = Σ whole-word marker
    occurrences; argmax with deterministic tie order (en,de,fr,es), 'und'
    (undetermined) when all scores are 0."""
    scores = {
        lang: sum(
            (F.regexp_count(F.lower(text), F.lit(rf"\b{w}\b")) for w in words),
            F.lit(0),
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed so earlier langs win ties (en > de > fr > es)
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (md5 is identical in Spark and DuckDB → oracle-checkable)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def with_textstats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("ws_tokens", whitespace_token_count(t))
        .withColumn("word_tokens", word_token_count(t))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(t), 6))
        .withColumn("quality", F.round(quality_score(t), 6))
        .withColumn("lang_pred", lang_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )
