"""Arabic light10 stemmer: spec-traced outputs + two-form identity.

Expected values hand-traced from the published light10 algorithm (Larkey
et al.) as bound by Lucene's ArabicAnalyzer; the heavier guarantee is that
the Python form and the generated-DuckDB-SQL form agree everywhere.
"""

from __future__ import annotations

import duckdb

from hypothesis import given, settings
from hypothesis import strategies as st

from nixiesearch_spark.light import arabic_py, arabic_sql_ctes


def _sql_stem(words: list[str], ctes_fn) -> list[str]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT i AS doc_id, w AS term "
        "FROM (SELECT unnest(range(len($words))) AS i, unnest($words) AS w)",
        {"words": words},
    )
    frag = ctes_fn("src", "out_cte", "x_")
    rows = con.execute(
        f"WITH {frag.strip()} SELECT term FROM out_cte ORDER BY doc_id"
    ).fetchall()
    return [r[0] for r in rows]


ARABIC_CASES = {
    # definite-article prefixes (one strip, first hit), ordered suffixes
    "المكتبة": "مكتب", "والكتاب": "كتاب", "كتابها": "كتاب",
    "المهندسون": "مهندس", "للبيانات": "بيان", "بالفهرس": "فهرس",
    # normalization: diacritics/tatweel stripped, alef/teh-marbuta folded
    "كِتَاب": "كتاب", "مـكـتـب": "مكتب", "قراءة": "قراء", "آأإ": "ااا",
    # length guards: و needs 4 letters; ال needs 2 remaining
    "وكتب": "كتب", "الو": "الو", "ال": "ال", "و": "و",
    # sequential suffix pass: يه blocked at len 3 but ه still strips
    "بيه": "بي", "يه": "يه",
    "": "",
}


def test_arabic_spec_cases():
    bad = {
        w: (arabic_py(w), want)
        for w, want in ARABIC_CASES.items()
        if arabic_py(w) != want
    }
    assert not bad, bad


def test_arabic_sql_equals_python():
    words = list(ARABIC_CASES) + [
        "استعلامات", "عربية", "ىة", "البياناتها", "والمكتبات", "فهرسة",
        "ولل", "والي", "باله", "ةةةة", "ييي", "spark", "foo_bar",
    ]
    got = _sql_stem(words, arabic_sql_ctes)
    want = [arabic_py(w) for w in words]
    bad = {w: (g, p) for w, g, p in zip(words, got, want) if g != p}
    assert not bad, bad


AR_ALPHA = "ابتثجحخدذرزسشصضطظعغفقكلمنهويءآأإىةـًَُّْ_01"


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=AR_ALPHA, min_size=0, max_size=10), min_size=1, max_size=30))
def test_arabic_two_form_identity_random(words):
    got = _sql_stem(words, arabic_sql_ctes)
    want = [arabic_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]


def test_arabic_analyzer_chain():
    from nixiesearch_spark.analysis import analyzer_py

    # stop filter drops في (surface form) before normalization/stemming
    assert analyzer_py("arabic")("البيانات والفهرس في كتابها") == [
        "بيان", "فهرس", "كتاب",
    ]
