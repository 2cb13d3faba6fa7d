"""Porter stemmer: full-pipeline outputs + three-form equivalence.

The reference's English analyzer is Lucene EnglishAnalyzer → PorterStemFilter
(``config/mapping/Language.scala:52-99``); expected values below are the
classic Porter algorithm's full-pipeline outputs (the famous demo pairs —
"agreed"→"agre", "generalizations"→"gener").
"""

from __future__ import annotations

import duckdb

from nixiesearch_spark.stem import porter_py, porter_sql

# word → full-pipeline Porter output
CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "running": "run", "jumped": "jump", "quickly": "quickli",
    "generalizations": "gener", "oscillators": "oscil",
    "archaeology": "archaeolog", "logic": "logic",
}


def test_porter_py_classic_outputs():
    bad = {w: (porter_py(w), want) for w, want in CASES.items() if porter_py(w) != want}
    assert not bad, bad


def test_porter_sql_equals_python():
    # the generated DuckDB expression must agree with the Python form on the
    # classic vocabulary, edge words, and synthetic-corpus-style tokens
    words = list(CASES) + [
        "a", "be", "the", "xyzzy", "ay", "ays", "tree", "trees", "by",
        "oed", "news", "proceed", "exceed", "succeed", "outing", "canning",
        "herring", "earring", "inning", "ident00001", "foo_bar", "x1ing",
        "sses", "ies", "eed", "ed", "ing", "ational", "ement", "yyyy",
    ]
    con = duckdb.connect()
    got = con.execute(f"SELECT {porter_sql('toks')} FROM (SELECT ? AS toks)", [words]
                      ).fetchall()[0][0]
    mism = [(w, porter_py(w), s) for w, s in zip(words, got) if porter_py(w) != s]
    assert not mism, mism


def test_porter_fuzz_sql_equals_python():
    # random lowercase words — the two forms must agree on arbitrary input
    import random
    import string

    rng = random.Random(1234)
    words = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 12)))
        for _ in range(500)
    ]
    con = duckdb.connect()
    got = con.execute(f"SELECT {porter_sql('toks')} FROM (SELECT ? AS toks)", [words]
                      ).fetchall()[0][0]
    mism = [(w, porter_py(w), s) for w, s in zip(words, got) if porter_py(w) != s]
    assert not mism, mism


def test_english_analyzer_chain(spark):
    # analyzer registry: standard tokenize → english stopwords → porter,
    # Catalyst/pandas col form identical to the py form
    from pyspark.sql import functions as F

    from nixiesearch_spark.analysis import analyzer_col, analyzer_py

    texts = [
        "The running dogs jumped over generalizations quickly",
        "Relational conditions were hopefulness and adjustments",
        None,
        "a an and the",  # all stopwords
    ]
    py = [analyzer_py("english")(t) for t in texts]
    assert py[0] == ["run", "dog", "jump", "over", "gener", "quickli"]
    assert py[3] == []
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    col = analyzer_col("english")(F.col("text"))
    got = [r["toks"] for r in df.select(col.alias("toks")).collect()]
    assert got == py
