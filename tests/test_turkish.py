"""Turkish chain: tokenizer (apostrophe filter + dotted/dotless-i fold
BEFORE generic lower), Çilden suffix-strip stemmer — python and DuckDB
forms must agree on every path."""

from __future__ import annotations

import random

import duckdb

from nixiesearch_spark.analysis import (
    analyzer_py,
    tokenize_turkish_py,
    turkish_tok_sql,
)
from nixiesearch_spark.light import turkish_py, turkish_sql_ctes

SAMPLES = [
    "Türkiye'nin başkenti Ankara'dır",
    "İstanbul ISPARTA ılık iklim",  # İ→i, I→ı before lower
    "kitap, kitabı; kitaplarımız!",
    "",
    None,
]


def test_tokenizer_turkish_casing():
    # İ lowers to i (not i + combining dot), I lowers to ı
    assert tokenize_turkish_py("İstanbul") == ["istanbul"]
    assert tokenize_turkish_py("ISPARTA") == ["ısparta"]
    # apostrophe drops the suffix after it (Lucene ApostropheFilter)
    assert tokenize_turkish_py("Türkiye'nin") == ["türkiye"]
    assert tokenize_turkish_py("Ankara’da ev") == ["ankara", "ev"]


def test_tokenizer_python_vs_duckdb():
    con = duckdb.connect()
    vals = ",".join(
        f"({i}, {'NULL' if t is None else chr(39) + t.replace(chr(39), chr(39) * 2) + chr(39)})"
        for i, t in enumerate(SAMPLES)
    )
    con.execute(f"CREATE TABLE src AS SELECT * FROM (VALUES {vals}) v(doc_id, t)")
    rows = con.execute(
        "SELECT doc_id, term FROM (" + turkish_tok_sql("t") + ") q"
    ).fetchall()
    got: dict[int, list[str]] = {i: [] for i in range(len(SAMPLES))}
    for d, term in rows:
        got[d].append(term)
    for i, t in enumerate(SAMPLES):
        assert sorted(got[i]) == sorted(tokenize_turkish_py(t)), f"doc {i}"


def test_known_conflations():
    # case/possessive/plural chains collapse; final consonant devoices
    assert {turkish_py(w) for w in ("ev", "evi", "evde", "evlerimizden")} == {"ev"}
    assert {turkish_py(w) for w in ("kitap", "kitabı", "kitaplar")} == {"kitap"}
    assert turkish_py("çocuğu") == "çocuk"
    # vowel harmony blocks a non-harmonizing strip (türki's final i)
    assert turkish_py("türkiye") == "türki"
    # <2 vowels → untouched (more_than_one_syllable test)
    assert turkish_py("ev") == "ev"
    assert turkish_py("spark") == "spark"


def test_python_vs_duckdb_identity():
    rng = random.Random(77)
    alpha = "abcçdefgğhıijklmnoöprsştuüvyz"
    words = [
        "evlerimizden", "kitabımız", "arabanın", "okuldaki", "bugünkü",
        "yapacaksınız", "gelirken", "çocukları", "gözlerimde", "şehirden",
        "olduğunu", "dediler", "kapıyı", "ankara", "istanbul",
    ] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{w}')" for i, w in enumerate(words))
    con.execute(
        f"CREATE TABLE toks AS SELECT * FROM (VALUES {vals}) v(doc_id, term)"
    )
    ctes = turkish_sql_ctes("toks", "stemmed", "tr_")
    rows = con.execute(
        f"WITH RECURSIVE {ctes} SELECT doc_id, term FROM stemmed ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == len(words)
    for i, got in rows:
        assert got == turkish_py(words[i]), repr(words[i])


def test_chain_order():
    # stop runs before stem on surface forms: "bir" is stopped, the rest
    # are stemmed; apostrophe suffix never reaches the index
    out = analyzer_py("turkish")("Bir kitabı Türkiye'nin evlerinde")
    assert out == ["kitap", "türki", "ev"]
