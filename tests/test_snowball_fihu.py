"""Snowball Finnish + Hungarian: python cascade vs generated DuckDB CTE
chain must agree word-for-word, including the region edge cases."""

from __future__ import annotations

import random

import duckdb

from nixiesearch_spark.snowball import (
    finnish_py,
    finnish_sql_ctes,
    hungarian_py,
    hungarian_sql_ctes,
)

FI_VOCAB = [
    "koirissa", "koiran", "koira", "koirien", "talossa", "taloissa",
    "talon", "talo", "taloihin", "taloa", "kirjat", "kirja", "kirjojen",
    "suurimmat", "suurin", "puun", "puu", "kissansa", "kissasi",
    "kissani", "nopeasti", "kaunista", "edellä", "tärkeintä",
    "tietokoneella", "tietokone", "järjestelmään", "järjestelmä",
    "hakujen", "haku", "puhelimen", "ystäviä", "ystävänsä",
    "suomalaisten", "vuosina", "aikana", "osoitteeseen", "spark", "ja",
]
HU_VOCAB = [
    "fákkal", "fát", "fák", "fa", "kávét", "kávé", "házakat", "házak",
    "háza", "ház", "házaimat", "házaink", "könyvekben", "könyvek",
    "könyve", "könyv", "barátokkal", "baráttal", "emberek", "ember",
    "adatok", "adat", "keresések", "keresés", "rendszerben", "rendszer",
    "asztalon", "gyerekeknek", "szavakat", "spark", "és",
]


def _identity(vocab, alpha, sql_ctes, py_fn, seed):
    rng = random.Random(seed)
    words = vocab + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 13)))
        for _ in range(400)
    ]
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{w}')" for i, w in enumerate(words))
    con.execute(
        f"CREATE TABLE toks AS SELECT * FROM (VALUES {vals}) v(doc_id, term)"
    )
    ctes = sql_ctes("toks", "stemmed", "x_").rstrip(",")
    rows = con.execute(
        f"WITH {ctes} SELECT doc_id, term FROM stemmed ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == len(words)
    for i, got in rows:
        assert got == py_fn(words[i]), repr(words[i])


def test_finnish_identity():
    _identity(FI_VOCAB, "abdefghijklmnoprstuvyäö", finnish_sql_ctes,
              finnish_py, 5)


def test_hungarian_identity():
    _identity(HU_VOCAB, "aábcdeéfghiíjklmnoóöőprstuúüűvyz",
              hungarian_sql_ctes, hungarian_py, 11)


def test_finnish_semantics():
    # case ending sets ending_removed → i-plural fires (koirissa);
    # t-plural + R2 imma clip (suurimmat); R1 guard (puun untouched)
    assert finnish_py("koirissa") == "koir"
    assert finnish_py("suurimmat") == "suurim"
    assert finnish_py("puun") == "puun"
    # tidy: final-e clip + double-consonant undouble (kissansa → kis)
    assert {finnish_py(w) for w in ("kissansa", "kissasi", "kissani")} == {"kis"}
    # sti wants R2: nopeasti keeps its t-stem (no particle removal)
    assert finnish_py("nopeasti") == "nopeast"


def test_hungarian_semantics():
    # v_ending after each routine converges linking-vowel chains
    assert {hungarian_py(w) for w in ("fákkal", "fát", "fák", "fa")} == {"fa"}
    assert {hungarian_py(w) for w in ("házakat", "házak", "háza", "ház")} == {"ház"}
    # instrumental assimilation: -kal on doubled k undoubles
    assert hungarian_py("barátokkal") == "barát"
    # digraph-aware R1: vowel-initial word, cs counts as one consonant
    assert hungarian_py("asztalon") == "asztal"


def test_chains():
    from nixiesearch_spark.analysis import analyzer_py

    assert analyzer_py("finnish")("datan ja indexin haku") == [
        "data", "index", "haku"]
    assert analyzer_py("hungarian")("az indexek és a datát") == [
        "index", "dat"]
