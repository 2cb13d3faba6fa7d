"""Unicode (Greek/Cyrillic) tokenizer: the three executable forms — python
re, Catalyst (Java regex), DuckDB (RE2) — must tokenize identically,
including the contextual-case trap (final sigma: all three lower() use the
simple per-code-point mapping)."""

from __future__ import annotations

import duckdb
import pytest

from nixiesearch_spark.analysis import (
    TOKEN_SPLIT_UNICODE,
    analyzer_py,
    tokenize_unicode_py,
)

SAMPLES = [
    "Привет мир, данные и индекс!",
    "Ελληνικά κείμενα· ΜΕΓΑΛΑ ΚΑΙ μικρά",
    "ΑΣ ΤΕΛΟΣ",  # final-sigma context: simple mapping σ, never ς
    "mixed русский and english λέξεις 42_x",
    "ёлки Ёлки ЙОД йод",
    "ὅτ᾽ἦλθε ῥᾴδιος",  # koronis U+1FBD is a delimiter; polytonic letters survive
    "сло҂во зна҃ки",  # Cyrillic thousands sign + titlo are delimiters
    # Arabic: diacritized word stays whole (harakat are word chars);
    # tatweel-stretched word stays whole; ؟ and ، are delimiters
    "البيانات كِتَاب مـكتب؟ فهرس، بحث",
    # Persian/Urdu letters incl. the ezafe ۀ and ZWNJ as a delimiter
    "کتابِ سیستم نامۀ می‌نویسد",
    # Devanagari: matras/virama/nukta are word chars; danda । is not
    "लड़कियाँ पुस्तकें। हिन्दी",
    "",
    "!!! £€ ---",
    None,
]


def test_marks_are_delimiters():
    assert tokenize_unicode_py("ὅτ᾽ἦλθε") == ["ὅτ", "ἦλθε"]
    assert tokenize_unicode_py("сло҂во") == ["сло", "во"]


def test_python_vs_catalyst(spark):
    from pyspark.sql import functions as F

    from nixiesearch_spark.analysis import tokenize_unicode_col

    rows = [(i, t) for i, t in enumerate(SAMPLES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", tokenize_unicode_col(F.col("text")).alias("toks")
        ).collect()
    }
    # NULL input: the Column form yields NULL (same as the standard
    # tokenizer — the builder clamps downstream); python form yields []
    want = {i: (tokenize_unicode_py(t) if t is not None else None) for i, t in rows}
    assert got == want


def test_python_vs_duckdb():
    con = duckdb.connect()
    for t in SAMPLES:
        if t is None:
            continue
        rows = con.execute(
            "SELECT list_filter(regexp_split_to_array("
            "translate(lower(substr($t, 1, 32000)), 'ς', 'σ'), "
            f"'{TOKEN_SPLIT_UNICODE}'), x -> x <> '' AND length(x) <= 255)",
            {"t": t},
        ).fetchone()[0]
        assert rows == tokenize_unicode_py(t), t


def test_russian_greek_chains():
    # russian = full chain (stop + Snowball Russian stemmer)
    assert analyzer_py("russian")("Данные и индекс на потоке") == [
        "дан", "индекс", "поток",
    ]
    # greek = full chain now: σ-fold (tokenizer) + accent fold + stop +
    # Ntais stemmer — δείκτης → δεικτησ → δεικτ
    assert analyzer_py("greek")("τα δεδομένα και ο δείκτης") == [
        "δεδομεν", "δεικτ",
    ]
    # standard (ASCII) still drops non-Latin — the pinned corpus spec
    assert analyzer_py("standard")("данные data") == ["data"]
    assert analyzer_py("standard_unicode")("данные data") == ["данные", "data"]


@pytest.mark.parametrize("word", ["ΑΣ", "ΣΙΓΜΑ", "ΟΔΥΣΣΕΥΣ", "τέλος", "ΤΕΛΟΣ"])
def test_final_sigma_normalized(spark, word):
    """lower + ς→σ (GreekLowerCaseFilter semantics) must agree across all
    three engines — DuckDB lower() alone applies the contextual
    final-sigma rule, and written Greek itself ends words in ς, so the
    normalization is what makes "τέλος" == lower("ΤΕΛΟΣ")."""
    from pyspark.sql import functions as F

    py = word.lower().replace("ς", "σ")
    assert "ς" not in py
    sp = spark.range(1).select(
        F.translate(F.lower(F.lit(word)), "ς", "σ").alias("w")
    ).first()["w"]
    dd = duckdb.connect().execute(
        "SELECT translate(lower($w), 'ς', 'σ')", {"w": word}
    ).fetchone()[0]
    assert sp == dd == py, (word, sp, dd, py)
