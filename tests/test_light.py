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


from nixiesearch_spark.light import (
    bulgarian_py,
    bulgarian_sql_ctes,
    czech_py,
    czech_sql_ctes,
)

BULGARIAN_CASES = {
    # definite article + trailing-vowel cascade
    "градът": "град", "книгата": "книг", "данните": "данн",
    "таблицата": "таблиц", "индексът": "индекс", "потокът": "поток",
    # plural rewrites (ци->к, зи->г, си->х), ове, еве->й
    # (езици is len 5: the ци->к rewrite needs len>5, so only и strips)
    "таблици": "таблик", "езици": "езиц", "синовете": "синов",
    # ен -> н and the penultimate-ъ drop
    "зелен": "зелн", "вълкът": "вълк",
    # guards: len<4 untouched; ът needs len>5
    "мъжът": "мъжът", "я": "я", "аб": "аб", "": "",
}


def test_bulgarian_spec_cases():
    bad = {
        w: (bulgarian_py(w), want)
        for w, want in BULGARIAN_CASES.items()
        if bulgarian_py(w) != want
    }
    assert not bad, bad


CZECH_CASES = {
    # case-ending cascade tiers
    "ženatech": "žn", "tématem": "témat", "zelených": "zeln",
    "stolech": "stol", "hradem": "hrad", "kočka": "kočk",
    # normalization: c/č->k, z/ž->h, e-removal, ů->o
    "kočce": "kočk", "noze": "noh", "praze": "prah", "stůl": "stol",
    "domů": "dom",
    # possessives
    "otcův": "otcov", "matčin": "matk",
    "les": "ls", "": "", "a": "a",
}


def test_czech_spec_cases():
    bad = {
        w: (czech_py(w), want)
        for w, want in CZECH_CASES.items()
        if czech_py(w) != want
    }
    assert not bad, bad


def test_bulgarian_czech_sql_equals_python():
    bg_words = list(BULGARIAN_CASES) + [
        "ища", "ищища", "бащевци", "хората", "жените", "планините",
        "заявките", "гради", "къща", "нов", "ден", "силен", "spark",
    ]
    got = _sql_stem(bg_words, bulgarian_sql_ctes)
    want = [bulgarian_py(w) for w in bg_words]
    assert got == want, [(w, g, p) for w, g, p in zip(bg_words, got, want) if g != p]

    cz_words = list(CZECH_CASES) + [
        "ženami", "můžeš", "dveře", "pes", "čt", "ešt", "datech",
        "partem", "indexem", "aueue", "foo_bar",
    ]
    got = _sql_stem(cz_words, czech_sql_ctes)
    want = [czech_py(w) for w in cz_words]
    assert got == want, [(w, g, p) for w, g, p in zip(cz_words, got, want) if g != p]


BG_ALPHA = "абвгдежзийклмнопрстуфхцчшщъьюя_01"
CZ_ALPHA = "abcdefghijklmnoprstuvyzáéíýůúěščřžďťň_01"


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=BG_ALPHA, min_size=0, max_size=10), min_size=1, max_size=25))
def test_bulgarian_two_form_identity_random(words):
    got = _sql_stem(words, bulgarian_sql_ctes)
    want = [bulgarian_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=CZ_ALPHA, min_size=0, max_size=10), min_size=1, max_size=25))
def test_czech_two_form_identity_random(words):
    got = _sql_stem(words, czech_sql_ctes)
    want = [czech_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]


from nixiesearch_spark.light import persian_py, persian_sql_ctes

PERSIAN_CASES = {
    # Farsi letter folds to Arabic counterparts
    "کتاب": "كتاب", "سیستم": "سيستم", "می": "مي", "های": "هاي",
    "ۀ": "ه",
    # Arabic normalization also applies (diacritics, alef forms)
    "كِتاب": "كتاب", "آب": "اب",
    # untouched
    "داده": "داده", "پردازش": "پردازش", "": "",
}


def test_persian_spec_cases():
    bad = {
        w: (persian_py(w), want)
        for w, want in PERSIAN_CASES.items()
        if persian_py(w) != want
    }
    assert not bad, bad


def test_persian_sql_equals_python():
    words = list(PERSIAN_CASES) + ["جستجو", "فهرست", "ۀٔ", "ے", "ہمارا", "spark"]
    got = _sql_stem(words, persian_sql_ctes)
    want = [persian_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]


def test_persian_analyzer_chain():
    from nixiesearch_spark.analysis import analyzer_py

    # ZWNJ splits می‌نویسد into two tokens, of which می is a stopword
    # (dropped POST-normalization, as is از); output tokens are
    # normalized (ی -> ي)
    assert analyzer_py("persian")("کتاب از سیستم می‌نویسد") == [
        "كتاب", "سيستم", "نويسد",
    ]


from nixiesearch_spark.light import hindi_py, hindi_sql_ctes

HINDI_CASES = {
    # normalization: nukta deletion / precomposed folds, then tier strips
    "लड़कियाँ": "लडक", "लड़का": "लडक", "क़िताब": "किताब",
    "किताबें": "किताब", "करेंगे": "कर", "बनाया": "बन",
    "पुस्तकों": "पुसतक", "लिखकर": "लिख", "खोजें": "खोज",
    # single-vowel tier with its len>2 guard
    "बड़ी": "बड", "की": "की",
    # tier guard: ाएगी needs len>5, जाएगी is 5 → only the ी strips
    "जाएगी": "जाएग",
    "खोज": "खोज", "": "",
}


def test_hindi_spec_cases():
    bad = {
        w: (hindi_py(w), want)
        for w, want in HINDI_CASES.items()
        if hindi_py(w) != want
    }
    assert not bad, bad


def test_hindi_sql_equals_python():
    words = list(HINDI_CASES) + [
        "आंकड़ों", "तालिकाओं", "हिन्दी", "खाना", "सूचकांक", "ियाँ",
        "ाएंगीा", "spark",
    ]
    got = _sql_stem(words, hindi_sql_ctes)
    want = [hindi_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]


def test_hindi_analyzer_chain():
    from nixiesearch_spark.analysis import analyzer_py

    # में is a stopword (compared post-normalization); survivors stem
    assert analyzer_py("hindi")("आंकड़ा तालिका में खोजें") == [
        "आंकड", "तालिक", "खोज",
    ]


from nixiesearch_spark.light import indonesian_py, indonesian_sql_ctes

INDONESIAN_CASES = {
    # inflectional layer
    "bukunya": "buku", "bukulah": "buku", "bukupun": "buku",
    # first-order prefixes with sound restoration
    "membaca": "baca", "menyapu": "sapu", "penulis": "tulis",
    "penyapu": "sapu", "mengambil": "ambil", "dibaca": "baca",
    "terbaik": "baik", "pembangunan": "bangun",
    # second-order prefixes + specials
    "berlari": "lari", "belajar": "ajar", "pelajar": "ajar",
    # prefix/suffix interplay: fo fired -> suffix -> second-order
    "mempermainkan": "main", "keberhasilan": "hasil", "diperbaiki": "baik",
    "kemampuan": "mampu", "keadilan": "adil",
    # two-syllable words are never stemmed
    "data": "data", "ini": "ini", "besi": "besi", "": "",
}


def test_indonesian_spec_cases():
    bad = {
        w: (indonesian_py(w), want)
        for w, want in INDONESIAN_CASES.items()
        if indonesian_py(w) != want
    }
    assert not bad, bad


def test_indonesian_sql_equals_python():
    words = list(INDONESIAN_CASES) + [
        "makanan", "minuman", "berkemampuan", "memakankah", "seri",
        "beserta", "perbaikan", "si", "kesi", "mesi", "pensi", "spark",
    ]
    got = _sql_stem(words, indonesian_sql_ctes)
    want = [indonesian_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]


ID_ALPHA = "abcdefghijklmnoprstuwy_01"


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=ID_ALPHA, min_size=0, max_size=12), min_size=1, max_size=25))
def test_indonesian_two_form_identity_random(words):
    got = _sql_stem(words, indonesian_sql_ctes)
    want = [indonesian_py(w) for w in words]
    assert got == want, [(w, g, p) for w, g, p in zip(words, got, want) if g != p]
