"""lightgen rule-table stemmers: spec-pinned outputs + two-form identity.

One rule table per language generates BOTH executable forms (python
interpreter + DuckDB SQL CTEs) — the heavyweight guarantee is that the two
forms agree on every input (hypothesis over each language's own alphabet);
the spec cases pin intended linguistic behavior (strip tiers, guards,
palatalization folds).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nixiesearch_spark import lightgen as lg


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


LATVIAN_CASES = {
    # affix table: length >= |affix|+3 and word vowel count > vc
    "datām": "dat", "data": "dat", "parts": "part", "part": "part",
    "indexiem": "index", "galdiem": "gald", "grāmatas": "grāmat",
    "mājās": "māj", "māja": "māj",
    # palatalization after the plural affixes (u/i/iem/us/os)
    "ceļu": "cel", "ceļi": "cel", "skaļu": "skal", "zaļš": "zaļ",
    "upju": "up",
    # guards: "es" fails len>=|affix|+3; single vowel words keep endings
    "es": "es", "s": "s", "ā": "ā",
}

LITHUANIAN_CASES = {
    "datos": "dat", "data": "dat", "partų": "part", "part": "part",
    "indexas": "index", "namuose": "nam", "knygoms": "knyg",
    "vyrai": "vyr", "ir": "ir",
}

ESTONIAN_CASES = {
    "datale": "data", "data": "data", "partist": "part", "part": "part",
    "indexiga": "index", "raamatutele": "raamatu", "majades": "maja",
    # single-letter endings need a 4-char stem (min_len 5)
    "laual": "laua", "laud": "laud", "ja": "ja",
}

GALICIAN_CASES = {
    # plural restorations + theme-vowel deletion + adverb
    "datas": "dat", "data": "dat", "partes": "part", "part": "part",
    "indexes": "index", "cancións": "canción", "canción": "canción",
    "papeis": "papel", "rapidamente": "rapid", "libros": "libr",
    "libro": "libr", "e": "e",
}

BASQUE_CASES = {
    "datak": "dat", "data": "dat", "partak": "part", "part": "part",
    "indexen": "index", "etxean": "etxe", "etxea": "etxe",
    "liburuetako": "liburu", "eta": "eta",  # len 3 < min-stem guard
}

IRISH_CASES = {
    # eclipsis prefix undo + suffix strips
    "ndata": "data", "data": "data", "bparta": "part", "part": "part",
    "indexanna": "index", "bhfuinneog": "fuinneog",
    "fuinneog": "fuinneog", "gcarr": "carr", "dtír": "tír",
    # prefix guards: too-short words keep the cluster
    "ngá": "ngá",
}

POLISH_CASES = {
    "datach": "dat", "data": "dat", "partami": "part", "part": "part",
    "indexem": "index", "domowego": "dom", "stołach": "stoł",
    "książkami": "książk", "i": "i",
}

UKRAINIAN_CASES = {
    "дані": "дан", "даних": "дан", "індексу": "індекс",
    "індекс": "індекс", "таблиця": "таблиц", "таблиці": "таблиц",
    "запитів": "запит", "пошуку": "пошук", "синього": "син",
    "книжками": "книжк", "і": "і",
}

SERBIAN_CASES = {
    # bald Cyrillic→Latin fold + digraphs, then case strips — Cyrillic and
    # Latin spellings of one word conflate
    "подаци": "podac", "podaci": "podac", "табела": "tabel",
    "tabele": "tabel", "индекса": "indeks", "indeks": "indeks",
    "претрага": "pretrag", "љубав": "ljubav", "ljubav": "ljubav",
    "џез": "dzez", "đak": "djak", "ђак": "djak", "čaša": "cas",
    "knjigovima": "knjig",
}

ARMENIAN_CASES = {
    "տվյալների": "տվյալ", "տվյալներ": "տվյալ", "ինդեքսում": "ինդեքս",
    "ինդեքս": "ինդեքս", "գիրքը": "գիրք", "որոնումներին": "որոն",
    "հարցումներով": "հարց", "և": "և",
}

TAMIL_CASES = {
    "தரவுகள்": "தரவு", "தரவு": "தரவு",
    "குறியீடுகளின்": "குறியீடு", "குறியீடு": "குறியீடு",
    # clitic rules restore the virama (லும்→ல், வும்→வு)
    "தேடலும்": "தேடல்", "தரவும்": "தரவு",
    "புத்தகங்களுக்கு": "புத்தகங்",
}

BENGALI_CASES = {
    "তথ্যের": "তথ্য", "তথ্য": "তথ্য", "সূচকগুলো": "সূচক",
    # phases cascade: দের strip then the final-vowel tier (ছেলে → ছেল too)
    "সূচক": "সূচক", "বইটি": "বই", "ছেলেদের": "ছেল",
    # decomposed nukta (য + ়) composes to য় (U+09DF) before the phases
    "হয়": "হয়",
}

SORANI_CASES = {
    "داتاکانی": "داتا", "داتاکان": "داتا", "ئیندێکسەکە": "ئیندێکس",
    "ئیندێکس": "ئیندێکس", "کتێبێکی": "کتێب", "گەڕان": "گەڕ",
    # normalization: Arabic yeh/kaf fold to the Farsi forms
    "كتيب": "کتیب",
}

BRAZILIAN_CASES = {
    "datas": "dat", "data": "dat", "partes": "part", "part": "part",
    "indexes": "index", "canções": "canção", "canção": "canção",
    "rapidamente": "rapid", "livros": "livr", "bons": "bom",
    "papéis": "papel", "jornais": "jornal",
}

SPEC_CASES = [
    ("latvian", LATVIAN_CASES),
    ("lithuanian", LITHUANIAN_CASES),
    ("estonian", ESTONIAN_CASES),
    ("galician", GALICIAN_CASES),
    ("basque", BASQUE_CASES),
    ("irish", IRISH_CASES),
    ("polish", POLISH_CASES),
    ("ukrainian", UKRAINIAN_CASES),
    ("serbian", SERBIAN_CASES),
    ("armenian", ARMENIAN_CASES),
    ("tamil", TAMIL_CASES),
    ("bengali", BENGALI_CASES),
    ("sorani", SORANI_CASES),
    ("brazilian", BRAZILIAN_CASES),
]

ALPHABETS = {
    "latvian": "abdegijklmnprsštuvzāēīūčļņžj_01",
    "lithuanian": "abdegijklmnoprstuvyząčęėįšųūž_01",
    "estonian": "abdegijklmnoprstuvõäöüšž_01",
    "galician": "abcdefgilmnoprstuxáéíóúñç_01",
    "basque": "abdeghijklmnoprstuxz_01",
    "irish": "abcdefghilmnoprstuáéíóú_01",
    "polish": "abcdefghijklmnoprstuwyząćęłńóśźż_01",
    "ukrainian": "абвгдежзиклмнопрстуфіїєюяьог_01",
    "serbian": "абвгдежзијклмнопрстуфхцчшљњџђabcdefghijklmnoprstuvzčćšžđ_01",
    "armenian": "աբգդեզէընթիլխծկհմնոպջռսվտրցւփքօֆև_01",
    "tamil": "கஙசஜடணதநபமயரலவழளறனாிீுூெேைொ்ஂஃஅஆஇஈஉஎஒ_01",
    "bengali": "অআইঈউএওকখগচছজটডণতথদধনপফবভমযরলশষসহািীুূেৈোৌ়্টি_01",
    "sorani": "ءابتجحخدرزسشعغفقلمنهوپچژگکیڕڤڵۆێەكيىـَُِ_01",
    "brazilian": "abcdefghijlmnopqrstuvxzãõáéíóúâêôç_01",
}


@pytest.mark.parametrize("lang,cases", SPEC_CASES)
def test_spec_cases(lang, cases):
    fn = getattr(lg, f"{lang}_py")
    bad = {w: (fn(w), want) for w, want in cases.items() if fn(w) != want}
    assert not bad, bad


@pytest.mark.parametrize("lang,cases", SPEC_CASES)
def test_sql_equals_python(lang, cases):
    fn = getattr(lg, f"{lang}_py")
    ctes = getattr(lg, f"{lang}_sql_ctes")
    words = list(cases) + ["", "spark", "foo_bar"]
    got = _sql_stem(words, ctes)
    want = [fn(w) for w in words]
    bad = {w: (g, p) for w, g, p in zip(words, got, want) if g != p}
    assert not bad, bad


@pytest.mark.parametrize("lang", [lang for lang, _ in SPEC_CASES])
@settings(max_examples=15, deadline=None)
@given(data=st.data())
def test_two_form_identity_random(lang, data):
    words = data.draw(
        st.lists(
            st.text(alphabet=ALPHABETS[lang], min_size=0, max_size=12),
            min_size=1,
            max_size=25,
        )
    )
    fn = getattr(lg, f"{lang}_py")
    ctes = getattr(lg, f"{lang}_sql_ctes")
    got = _sql_stem(words, ctes)
    want = [fn(w) for w in words]
    assert got == want, [
        (w, g, p) for w, g, p in zip(words, got, want) if g != p
    ]


def test_no_shadowed_rules():
    # first-match-wins makes a rule DEAD when an earlier rule in the same
    # phase matches a strict superset of its tokens (the Irish "each"
    # after "ach" bug): every later rule must be reachable. Earlier rule i
    # covers later rule j iff j's literal extends i's on the match side,
    # i's effective length guard is no tighter, and i's vowel guard is no
    # stricter. Self-replace "protect" rules shadow later rules by design;
    # that direction is fine — only fully-covered LATER rules are bugs.
    for name, spec in lg._SPECS.items():
        for pi, ph in enumerate(spec.phases):
            for j, rj in enumerate(ph.rules):
                for ri in ph.rules[:j]:
                    if ph.mode == "suffix":
                        ext = rj.lit.endswith(ri.lit)
                    else:
                        ext = rj.lit.startswith(ri.lit)
                    len_ok = max(ri.min_len, len(ri.lit)) <= max(
                        rj.min_len, len(rj.lit)
                    )
                    vow_ok = ri.vowel_gt is None or (
                        rj.vowel_gt is not None and rj.vowel_gt >= ri.vowel_gt
                    )
                    assert not (ext and len_ok and vow_ok), (
                        f"{name} phase {pi}: rule {rj.lit!r} is dead — "
                        f"shadowed by earlier {ri.lit!r}"
                    )


def test_analyzer_chains():
    from nixiesearch_spark.analysis import analyzer_py

    assert analyzer_py("latvian")("datām un indexiem") == ["dat", "index"]
    assert analyzer_py("lithuanian")("datos ir partų") == ["dat", "part"]
    assert analyzer_py("estonian")("datale ja partist") == ["data", "part"]
    assert analyzer_py("galician")("datas e partes") == ["dat", "part"]
    assert analyzer_py("basque")("datak eta partak") == ["dat", "part"]
    assert analyzer_py("irish")("ndata agus bparta") == ["data", "part"]
    assert analyzer_py("polish")("datach i partami") == ["dat", "part"]
    assert analyzer_py("ukrainian")("даних і індексу") == ["дан", "індекс"]
    # mixed-script Serbian: the bald fold makes Cyrillic and Latin one term
    assert analyzer_py("serbian")("индекса tabele и") == ["indeks", "tabel"]
    assert analyzer_py("armenian")("տվյալների ինդեքսում և") == ["տվյալ", "ինդեքս"]
    assert analyzer_py("tamil")("தரவுகள் குறியீடுகளின் மற்றும்") == ["தரவு", "குறியீடு"]
    assert analyzer_py("bengali")("তথ্যের সূচকগুলো এবং") == ["তথ্য", "সূচক"]
    assert analyzer_py("sorani")("داتاکانی ئیندێکسەکە و") == ["داتا", "ئیندێکس"]
    assert analyzer_py("brazilian")("datas e partes") == ["dat", "part"]
    # thai run-bigram chain (stopword-after-bigram like cjk)
    assert analyzer_py("thai")("ดัชนี the") == ["ดั", "ัช", "ชน", "นี"]
