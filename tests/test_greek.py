"""Greek (Ntais/Saroukos) stemmer: the python cascade and the generated
DuckDB CTE chain must agree rule-for-rule, and the analyzer chain must
apply norm → stop → stem in Lucene GreekAnalyzer order."""

from __future__ import annotations

import random

import duckdb

from nixiesearch_spark.greek import (
    greek_norm_py,
    greek_py,
    greek_sql_ctes,
    greek_stem_py,
)

# one word per rule family (plus <4-char passthroughs and non-Greek)
VOCAB = [
    "καθεστωτοσ", "γεγονοτων", "φωσ", "φωτα", "κρεασ", "κρεατων",
    "τερατα", "φαγιου", "σκαγια", "τατογιων",
    "γιαγιαδεσ", "πατεραδων", "ομαδεσ",
    "γηπεδεσ", "εξεδων", "αρκουδεσ", "πεταλουδων",
    "θεων", "ελεωσ", "παιδια", "παιδιου", "βιβλια",
    "λογικα", "λογικου", "καταδικα",
    "αγαπαμε", "αγαμε", "περπατησαμε", "ανεβηκαμε",
    "τραγανε", "περπατησανε", "τρωγανε",
    "περπατησετε", "τρεχετε",
    "τρεχοντασ", "αρχοντασ", "κρεωντασ",
    "ονομαστε", "χανομαστε", "ονιομαστε",
    "πιεστε", "συμπιεστε", "εκτελεστε",
    "χτυπηθηκα", "διαθηκεσ", "ναρθηκεσ",
    "τρεχουσα", "δευτερευουσεσ",
    "τρωγαγε", "κολλαγεσ", "ψοφαγα",
    "δωδεκανησου", "περπατησε",
    "χτενιστε", "απληστε",
    "τρεχουνε", "σπιουνε", "περπατησουνε",
    "τρεχουμε", "περπατησουμε",
    "κτηματα", "ονοματων", "προβληματοσ",
    "περπατουσαν", "χανομασταν", "αγαπιουνται", "ιοντουσαν",
    "καλοσ", "ωραιοι", "θαλασσα", "σπιτι", "ανθρωποσ",
    "ομορφοτερη", "εξυπνοτατοσ", "ακριβεστερο",
    "και", "θα", "α", "αβγ", "spark", "data",
]


def test_norm_is_accent_fold():
    assert greek_norm_py("καλόσ") == "καλοσ"
    assert greek_norm_py("προϊόν") == "προιον"
    assert greek_norm_py("ΐΰϊϋ") == "ιυιυ"
    assert greek_norm_py("spark") == "spark"


def test_known_conflations():
    # inflection families collapse to one stem
    assert {greek_py(w) for w in ("καλόσ", "καλοί", "καλό")} == {"καλ"}
    assert {greek_py(w) for w in ("άνθρωποσ", "ανθρώπων", "άνθρωποι")} == {"ανθρωπ"}
    assert {greek_py(w) for w in ("παιδιά", "παιδιού", "παιδί")} == {"παιδ"}
    # rule-21 gating: a word already shortened by rules 0-20 skips it
    assert greek_py("γεγονότα") == "γεγον"
    # <4 chars bypass the cascade entirely
    assert greek_py("φωσ") == "φωσ"
    assert greek_py("και") == "και"


def test_python_vs_duckdb_identity():
    rng = random.Random(1234)
    alpha = "αβγδεζηθικλμνξοπρστυφχψω"
    words = VOCAB + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    con = duckdb.connect()
    vals = ",".join(f"({i}, '{w}')" for i, w in enumerate(words))
    con.execute(
        f"CREATE TABLE toks AS SELECT * FROM (VALUES {vals}) v(doc_id, term)"
    )
    ctes = greek_sql_ctes("toks", "stemmed", "el_").rstrip(",")
    rows = con.execute(
        f"WITH {ctes} SELECT doc_id, term FROM stemmed ORDER BY doc_id"
    ).fetchall()
    assert len(rows) == len(words)
    for i, got in rows:
        assert got == greek_py(words[i]), repr(words[i])


def test_sql_stop_filter_matches_chain():
    from nixiesearch_spark.analysis import LANG_STOPWORDS, analyzer_py

    # chain: tokenize (lower+ς→σ) → accent fold → stop → stem
    out = analyzer_py("greek")("Τα παιδιά είναι από την θάλασσα")
    assert out == [greek_stem_py("παιδια"), greek_stem_py("θαλασσα")]
    # the SQL form drops the same stopwords
    con = duckdb.connect()
    words = ["τα", "παιδια", "ειναι", "απο", "την", "θαλασσα"]
    vals = ",".join(f"({i}, '{w}')" for i, w in enumerate(words))
    con.execute(
        f"CREATE TABLE toks AS SELECT * FROM (VALUES {vals}) v(doc_id, term)"
    )
    ctes = greek_sql_ctes(
        "toks", "stemmed", "el_", stops=LANG_STOPWORDS["greek"]
    ).rstrip(",")
    kept = [
        t
        for _, t in con.execute(
            f"WITH {ctes} SELECT doc_id, term FROM stemmed ORDER BY doc_id"
        ).fetchall()
    ]
    assert kept == out
