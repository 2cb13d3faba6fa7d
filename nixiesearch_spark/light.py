"""Light (non-Snowball) per-language stemmers — one spec, two executable
forms each, same contract as ``nixiesearch_spark.snowball``:

- ``*_py`` — pure Python, one token at a time; used by query-time analysis,
  the numpy oracle, and (memoized over Arrow batches) the index build path.
- ``*_sql_ctes`` — generated DuckDB SQL CTE fragment over exploded
  ``(doc_id, term)`` rows, so the correctness-gate oracle reproduces the
  stemmed-field BM25 end-to-end in SQL.

Arabic here is the published "light10" algorithm (Larkey, Ballesteros &
Connell, "Light Stemming for Arabic Information Retrieval") that the
reference's ``language: ar`` analyzer applies (Lucene ArabicAnalyzer =
tokenize → lowercase → stop → normalization → light10 stem; reference
``config/mapping/Language.scala:59``). Two stages:

1. Normalization: strip tatweel (U+0640) and the eight harakat/tanween
   diacritics (U+064B–U+0652); fold the hamza/madda alef forms آ أ إ to
   bare ا; fold dotless ى to ي and teh-marbuta ة to ه.
2. Stemming: remove at most ONE definite-article prefix, first of
   ال وال بال كال فال لل و in that order whose length guard passes
   (single-letter و needs a 4-letter word, the others need 2 letters
   beyond the prefix); then a SINGLE ORDERED PASS over the suffixes
   ها ان ات ون ين يه ية ه ة ي where each may strip once if 2 letters
   would remain — sequential, so e.g. يتها loses only ها.

Because the analyzer normalizes before stemming, ة has already become ه
when the stemmer runs; the ة suffix entries are kept anyway so the
stemmer is the complete published table (and correct standalone).
"""

from __future__ import annotations

# ------------------------------------------------------------------ arabic

# normalization tables
_AR_FOLD = {"آ": "ا", "أ": "ا", "إ": "ا", "ى": "ي", "ة": "ه"}
_AR_DELETE = "ـًٌٍَُِّْ"  # tatweel + fathatan..sukun (U+0640, U+064B-U+0652)

_AR_NORM_TRANS = {ord(k): v for k, v in _AR_FOLD.items()}
_AR_NORM_TRANS.update({ord(c): None for c in _AR_DELETE})

# ordered prefix list; a prefix strips only if the length guard holds
# (و needs len >= 4, the rest len >= prefix + 2), first hit wins
AR_PREFIXES = ["ال", "وال", "بال", "كال", "فال", "لل", "و"]
# ordered suffix list; ONE sequential pass, each entry may strip once if
# at least 2 chars remain
AR_SUFFIXES = ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي"]


def arabic_norm_py(w: str) -> str:
    return w.translate(_AR_NORM_TRANS)


def arabic_stem_py(w: str) -> str:
    for pre in AR_PREFIXES:
        np = len(pre)
        if w.startswith(pre) and len(w) >= (4 if np == 1 else np + 2):
            w = w[np:]
            break
    for suf in AR_SUFFIXES:
        ns = len(suf)
        if w.endswith(suf) and len(w) >= ns + 2:
            w = w[:-ns]
    return w


def arabic_py(word: str) -> str:
    """Full normalize-then-light10 chain (the analyzer's per-token form)."""
    return arabic_stem_py(arabic_norm_py(word))


# ---- arabic SQL form


def _ar_norm_sql(x: str) -> str:
    folded = x
    for k, v in _AR_FOLD.items():
        folded = f"replace({folded}, '{k}', '{v}')"
    return f"translate({folded}, '{_AR_DELETE}', '')"


def _ar_prefix_sql(x: str) -> str:
    cases = []
    for pre in AR_PREFIXES:
        np = len(pre)
        need = 4 if np == 1 else np + 2
        cases.append(
            f"WHEN starts_with({x}, '{pre}') AND length({x}) >= {need} "
            f"THEN substr({x}, {np + 1})"
        )
    return "CASE " + " ".join(cases) + f" ELSE {x} END"


def _ar_suffix_step_sql(x: str, suf: str) -> str:
    ns = len(suf)
    return (
        f"CASE WHEN ends_with({x}, '{suf}') AND length({x}) >= {ns + 2} "
        f"THEN substr({x}, 1, length({x}) - {ns}) ELSE {x} END"
    )


def arabic_sql_ctes(src: str, out: str, p: str = "ar_") -> str:
    """CTE-chain fragment stemming ``src(doc_id, term)`` → ``out`` with the
    normalize + light10 flow. The suffix pass is sequential (order is part
    of the spec), so each suffix is its own CTE step — the length guard
    re-evaluates against the CURRENT length like the python loop."""
    steps = []
    prev = f"{p}pf"
    for i, suf in enumerate(AR_SUFFIXES):
        name = out if i == len(AR_SUFFIXES) - 1 else f"{p}s{i}"
        steps.append(
            f"{name} AS MATERIALIZED (SELECT doc_id, "
            f"{_ar_suffix_step_sql('term', suf)} AS term FROM {prev})"
        )
        prev = name
    joined = ",\n".join(steps)
    return f"""
{p}nm AS MATERIALIZED (SELECT doc_id, {_ar_norm_sql("term")} AS term FROM {src}),
{p}pf AS MATERIALIZED (SELECT doc_id, {_ar_prefix_sql("term")} AS term FROM {p}nm),
{joined}
"""


# --------------------------------------------------------------- bulgarian
# Savoy's Bulgarian light stemmer ("Searching Strategies for the Bulgarian
# Language", IR 10(6)) as bound by Lucene's BulgarianAnalyzer (reference
# config/mapping/Language.scala:61). Cascade over a Cyrillic token:
# whole-stemmer guard len>=4; an ища early-exit; definite-article removal;
# plural removal; trailing я then а/о/е; ен→н; penultimate-ъ drop. Each
# tier is an ORDERED if-cascade with length guards on the CURRENT length
# (not longest-match amongs).


def bulgarian_py(word: str) -> str:
    w = word
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]

    # article
    if len(w) > 6 and w.endswith("ият"):
        w = w[:-3]
    elif len(w) > 5 and (
        w.endswith("ът") or w.endswith("то") or w.endswith("те")
        or w.endswith("та") or w.endswith("ия")
    ):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("ят"):
        w = w[:-2]

    # plural
    if len(w) > 6 and w.endswith("овци"):
        w = w[:-3]
    elif len(w) > 6 and w.endswith("ове"):
        w = w[:-3]
    elif len(w) > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif len(w) > 5 and w.endswith("ища"):
        w = w[:-3]
    elif len(w) > 5 and w.endswith("та"):
        w = w[:-2]
    elif len(w) > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif len(w) > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif len(w) > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif len(w) > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif len(w) > 4 and w.endswith("и"):
        w = w[:-1]

    if len(w) > 3 and w.endswith("я"):
        w = w[:-1]
    if len(w) > 3 and (w.endswith("а") or w.endswith("о") or w.endswith("е")):
        w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


def _bg_article_sql(x: str) -> str:
    return (
        f"CASE WHEN length({x}) > 6 AND ends_with({x}, 'ият') THEN {_chop(x, 3)} "
        f"WHEN length({x}) > 5 AND (ends_with({x}, 'ът') OR ends_with({x}, 'то') "
        f"OR ends_with({x}, 'те') OR ends_with({x}, 'та') OR ends_with({x}, 'ия')) "
        f"THEN {_chop(x, 2)} "
        f"WHEN length({x}) > 4 AND ends_with({x}, 'ят') THEN {_chop(x, 2)} "
        f"ELSE {x} END"
    )


def _bg_plural_sql(x: str) -> str:
    at3 = f"substr({x}, length({x}) - 2, 1)"
    last = f"substr({x}, length({x}), 1)"
    return (
        f"CASE WHEN length({x}) > 6 AND ends_with({x}, 'овци') THEN {_chop(x, 3)} "
        f"WHEN length({x}) > 6 AND ends_with({x}, 'ове') THEN {_chop(x, 3)} "
        f"WHEN length({x}) > 6 AND ends_with({x}, 'еве') THEN {_chop(x, 3)} || 'й' "
        f"WHEN length({x}) > 5 AND ends_with({x}, 'ища') THEN {_chop(x, 3)} "
        f"WHEN length({x}) > 5 AND ends_with({x}, 'та') THEN {_chop(x, 2)} "
        f"WHEN length({x}) > 5 AND ends_with({x}, 'ци') THEN {_chop(x, 2)} || 'к' "
        f"WHEN length({x}) > 5 AND ends_with({x}, 'зи') THEN {_chop(x, 2)} || 'г' "
        f"WHEN length({x}) > 5 AND {at3} = 'е' AND {last} = 'и' "
        f"THEN {_chop(x, 3)} || 'я' || substr({x}, length({x}) - 1, 1) "
        f"WHEN length({x}) > 4 AND ends_with({x}, 'си') THEN {_chop(x, 2)} || 'х' "
        f"WHEN length({x}) > 4 AND ends_with({x}, 'и') THEN {_chop(x, 1)} "
        f"ELSE {x} END"
    )


def _chop(x: str, n: int) -> str:
    return f"substr({x}, 1, length({x}) - {n})"


def bulgarian_sql_ctes(src: str, out: str, p: str = "bg_") -> str:
    """The ``done`` column carries the two early exits (len<4 whole-stemmer
    guard and the ища fast path) past every later stage."""
    ya = (
        f"CASE WHEN NOT done AND length(term) > 3 AND ends_with(term, 'я') "
        f"THEN {_chop('term', 1)} ELSE term END"
    )
    aoe = (
        f"CASE WHEN NOT done AND length(term) > 3 AND (ends_with(term, 'а') "
        f"OR ends_with(term, 'о') OR ends_with(term, 'е')) "
        f"THEN {_chop('term', 1)} ELSE term END"
    )
    en = (
        f"CASE WHEN NOT done AND length(term) > 4 AND ends_with(term, 'ен') "
        f"THEN {_chop('term', 2)} || 'н' ELSE term END"
    )
    hard = (
        f"CASE WHEN NOT done AND length(term) > 5 "
        f"AND substr(term, length(term) - 1, 1) = 'ъ' "
        f"THEN {_chop('term', 2)} || substr(term, length(term), 1) ELSE term END"
    )
    return f"""
{p}g AS MATERIALIZED (SELECT doc_id,
  CASE WHEN length(term) > 5 AND ends_with(term, 'ища') THEN {_chop('term', 3)} ELSE term END AS term,
  (length(term) < 4 OR (length(term) > 5 AND ends_with(term, 'ища'))) AS done
  FROM {src}),
{p}ar AS MATERIALIZED (SELECT doc_id, done,
  CASE WHEN NOT done THEN {_bg_article_sql("term")} ELSE term END AS term FROM {p}g),
{p}pl AS MATERIALIZED (SELECT doc_id, done,
  CASE WHEN NOT done THEN {_bg_plural_sql("term")} ELSE term END AS term FROM {p}ar),
{p}ya AS MATERIALIZED (SELECT doc_id, done, {ya} AS term FROM {p}pl),
{p}ao AS MATERIALIZED (SELECT doc_id, done, {aoe} AS term FROM {p}ya),
{p}en AS MATERIALIZED (SELECT doc_id, done, {en} AS term FROM {p}ao),
{out} AS MATERIALIZED (SELECT doc_id, {hard} AS term FROM {p}en)
"""


# ------------------------------------------------------------------- czech
# Dolamic & Savoy's Czech light stemmer ("Indexing and stemming approaches
# for the Czech language", IP&M 45) as bound by Lucene's CzechAnalyzer
# (reference config/mapping/Language.scala:65). Three stages: case-ending
# removal (ordered length-guarded cascade), possessive removal (ov/ův/in),
# then palatalization-aware normalization of the new ending.

_CZ_CASE_5 = ["ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými"]
_CZ_CASE_4 = ["em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou"]
_CZ_VOWELS = "aeiouůyáéíýě"


def czech_py(word: str) -> str:
    w = word

    # case endings
    if len(w) > 7 and w.endswith("atech"):
        w = w[:-5]
    elif len(w) > 6 and (w.endswith("ětem") or w.endswith("etem") or w.endswith("atům")):
        w = w[:-4]
    elif len(w) > 5 and any(w.endswith(s) for s in _CZ_CASE_5):
        w = w[:-3]
    elif len(w) > 4 and any(w.endswith(s) for s in _CZ_CASE_4):
        w = w[:-2]
    elif len(w) > 3 and w[-1] in _CZ_VOWELS:
        w = w[:-1]

    # possessives
    if len(w) > 5 and (w.endswith("ov") or w.endswith("ův") or w.endswith("in")):
        w = w[:-2]

    # normalization of the fresh ending
    if not w:
        return w
    if w.endswith("čt"):
        w = w[:-2] + "ck"
    elif w.endswith("št"):
        w = w[:-2] + "šk"
    elif w[-1] in "cč":
        w = w[:-1] + "k"
    elif w[-1] in "zž":
        w = w[:-1] + "h"
    elif len(w) > 1 and w[-2] == "e":
        w = w[:-2] + w[-1]
    elif len(w) > 2 and w[-2] == "ů":
        w = w[:-2] + "o" + w[-1]
    return w


def _cz_case_sql(x: str) -> str:
    c5 = " OR ".join(f"ends_with({x}, '{s}')" for s in _CZ_CASE_5)
    c4 = " OR ".join(f"ends_with({x}, '{s}')" for s in _CZ_CASE_4)
    return (
        f"CASE WHEN length({x}) > 7 AND ends_with({x}, 'atech') THEN {_chop(x, 5)} "
        f"WHEN length({x}) > 6 AND (ends_with({x}, 'ětem') OR ends_with({x}, 'etem') "
        f"OR ends_with({x}, 'atům')) THEN {_chop(x, 4)} "
        f"WHEN length({x}) > 5 AND ({c5}) THEN {_chop(x, 3)} "
        f"WHEN length({x}) > 4 AND ({c4}) THEN {_chop(x, 2)} "
        f"WHEN length({x}) > 3 AND contains('{_CZ_VOWELS}', substr({x}, length({x}), 1)) "
        f"THEN {_chop(x, 1)} ELSE {x} END"
    )


def _cz_poss_sql(x: str) -> str:
    return (
        f"CASE WHEN length({x}) > 5 AND (ends_with({x}, 'ov') OR ends_with({x}, 'ův') "
        f"OR ends_with({x}, 'in')) THEN {_chop(x, 2)} ELSE {x} END"
    )


def _cz_norm_sql(x: str) -> str:
    last = f"substr({x}, length({x}), 1)"
    pen = f"substr({x}, length({x}) - 1, 1)"
    return (
        f"CASE WHEN {x} = '' THEN {x} "
        f"WHEN ends_with({x}, 'čt') THEN {_chop(x, 2)} || 'ck' "
        f"WHEN ends_with({x}, 'št') THEN {_chop(x, 2)} || 'šk' "
        f"WHEN {last} IN ('c', 'č') THEN {_chop(x, 1)} || 'k' "
        f"WHEN {last} IN ('z', 'ž') THEN {_chop(x, 1)} || 'h' "
        f"WHEN length({x}) > 1 AND {pen} = 'e' THEN {_chop(x, 2)} || {last} "
        f"WHEN length({x}) > 2 AND {pen} = 'ů' THEN {_chop(x, 2)} || 'o' || {last} "
        f"ELSE {x} END"
    )


def czech_sql_ctes(src: str, out: str, p: str = "cz_") -> str:
    return f"""
{p}cs AS MATERIALIZED (SELECT doc_id, {_cz_case_sql("term")} AS term FROM {src}),
{p}po AS MATERIALIZED (SELECT doc_id, {_cz_poss_sql("term")} AS term FROM {p}cs),
{out} AS MATERIALIZED (SELECT doc_id, {_cz_norm_sql("term")} AS term FROM {p}po)
"""


# ----------------------------------------------------------------- persian
# Lucene's PersianAnalyzer analog (reference config/mapping/Language.scala
# fa binding): there is NO stemmer — the chain is tokenize (ZWNJ U+200C is
# a delimiter, standing in for Lucene's PersianCharFilter ZWNJ→space) →
# lowercase → ARABIC normalization → PERSIAN normalization → stop filter.
# Note the stop filter runs AFTER normalization (opposite of the arabic
# chain), so the stop set is compared in normalized form. The Persian
# normalizer folds the Farsi letter forms to their Arabic counterparts:
# ی (U+06CC) and ے (U+06D2) → ي; ک (U+06A9) → ك; ہ (U+06C1) and
# ۀ (U+06C0) → ه; the hamza-above mark (U+0654) is deleted.

_FA_FOLD = {"ی": "ي", "ے": "ي", "ک": "ك", "ہ": "ه", "ۀ": "ه"}
_FA_NORM_TRANS = {ord(k): v for k, v in _FA_FOLD.items()}
_FA_NORM_TRANS[0x0654] = None  # hamza above


def persian_norm_py(w: str) -> str:
    return w.translate(_FA_NORM_TRANS)


def persian_py(word: str) -> str:
    """Arabic normalization then Persian normalization (the analyzer's
    per-token form; filter order matches Lucene's PersianAnalyzer)."""
    return persian_norm_py(arabic_norm_py(word))


def _fa_norm_sql(x: str) -> str:
    folded = _ar_norm_sql(x)
    for k, v in _FA_FOLD.items():
        folded = f"replace({folded}, '{k}', '{v}')"
    return f"translate({folded}, 'ٔ', '')"


def persian_sql_ctes(src: str, out: str, p: str = "fa_") -> str:
    """Normalization only — the caller applies the (normalized-form) stop
    filter AFTER this fragment, matching the analyzer's filter order."""
    return f"""
{out} AS MATERIALIZED (SELECT doc_id, {_fa_norm_sql("term")} AS term FROM {src})
"""


# ------------------------------------------------------------------- hindi
# Lucene's HindiAnalyzer analog (reference config/mapping/Language.scala hi
# binding): unicode (Devanagari-aware) tokenize → stop → Hindi
# normalization → the Ramanathan & Rao (2003) light stemmer that Lucene's
# HindiStemmer binds. Normalization here is the high-frequency subset of
# Lucene's HindiNormalizer: the eight consonant+nukta precomposed forms
# fold to their base consonants, chandrabindu folds to anusvara, the
# combining nukta and virama are deleted (the rare candra-vowel foldings
# are intentionally omitted — documented deviation). Stemming strips ONE
# suffix from the longest applicable tier (5→1 chars), each tier guarded
# by a minimum word length, mirroring the published suffix families.

# PRECOMPOSED nukta consonants (U+0929/0931/0934, U+0958–095F) fold to
# their base letters; the same letters typed DECOMPOSED (base + combining
# nukta U+093C) reduce identically via the nukta deletion below.
_HI_FOLD = {
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ँ": "ं",  # chandrabindu → anusvara
}
_HI_DELETE = "़्"  # nukta + virama

_HI_NORM_TRANS = {ord(k): v for k, v in _HI_FOLD.items()}
_HI_NORM_TRANS.update({ord(c): None for c in _HI_DELETE})

# tiers: (min surviving length guard, strip count, suffixes)
_HI_TIERS = [
    (6, 5, ["ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"]),
    (5, 4, ["ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
            "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
            "ियों", "ियां"]),
    (4, 3, ["ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
            "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
            "ुआं"]),
    (3, 2, ["कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
            "ती", "ता", "ाँ", "ां", "ों", "ें"]),
    (2, 1, ["ो", "े", "ू", "ु", "ी", "ि", "ा"]),
]


def hindi_norm_py(w: str) -> str:
    return w.translate(_HI_NORM_TRANS)


def hindi_stem_py(w: str) -> str:
    for min_len, n, sufs in _HI_TIERS:
        if len(w) > min_len and any(w.endswith(s) for s in sufs):
            return w[:-n]
    return w


def hindi_py(word: str) -> str:
    return hindi_stem_py(hindi_norm_py(word))


def _hi_norm_sql(x: str) -> str:
    folded = x
    for k, v in _HI_FOLD.items():
        folded = f"replace({folded}, '{k}', '{v}')"
    return f"translate({folded}, '{_HI_DELETE}', '')"


def _hi_stem_sql(x: str) -> str:
    cases = []
    for min_len, n, sufs in _HI_TIERS:
        ends = " OR ".join(f"ends_with({x}, '{s}')" for s in sufs)
        cases.append(f"WHEN length({x}) > {min_len} AND ({ends}) THEN {_chop(x, n)}")
    return "CASE " + " ".join(cases) + f" ELSE {x} END"


def hindi_sql_ctes(src: str, out: str, p: str = "hi_", stops: list[str] | None = None) -> str:
    """norm → (optional stop filter on NORMALIZED terms — the analyzer's
    filter order) → stem."""
    mid = f"{p}nm"
    stop_cte = ""
    if stops:
        lst = "[" + ",".join(f"'{w}'" for w in stops) + "]"
        stop_cte = (
            f"{p}st AS MATERIALIZED (SELECT doc_id, term FROM {p}nm "
            f"WHERE NOT list_contains({lst}, term)),\n"
        )
        mid = f"{p}st"
    return f"""
{p}nm AS MATERIALIZED (SELECT doc_id, {_hi_norm_sql("term")} AS term FROM {src}),
{stop_cte}{out} AS MATERIALIZED (SELECT doc_id, {_hi_stem_sql("term")} AS term FROM {mid})
"""


# -------------------------------------------------------------- indonesian
# Tala's (2003) Indonesian stemmer family as bound by Lucene's
# IndonesianAnalyzer (reference config/mapping/Language.scala id binding):
# inflectional particles (-kah/-lah/-pun) and possessives (-ku/-mu/-nya),
# then the derivational layer — ONE first-order prefix (meng-/meny-/men-/
# mem-/me-/peng-/peny-/pen-/pem-/di-/ter-/ke-, with the sound-restoring
# recodings meny|peny+V → s, mem|pem+V → p, pen+V → t), ONE second-order
# prefix (ber-/be..er/per-/pe- + the bel-/pel- ajar specials), and ONE
# suffix (-kan/-an/-i) whose legality depends on which prefix fired
# (flag-gated illegal combinations, e.g. ke- ... -kan). Control flow: if a
# first-order prefix fired, try the suffix, and only if THAT fired try a
# second-order prefix; otherwise second-order prefix first, then suffix.
# Every removal decrements the syllable (vowel) count and each step is
# guarded by "more than 2 syllables remain". Where Tala's paper and
# Lucene's binding differ in recoding details, this module follows the
# table above and the two executable forms stay rule-identical.

_ID_VOWELS = "aeiou"

# flag bits (which prefix fired gates which suffix is legal)
_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64,
)


def _id_ns(w: str) -> int:
    return sum(1 for c in w if c in _ID_VOWELS)


def _id_first_order(w: str):
    """→ (new_word, flag, fired)."""
    V = _ID_VOWELS
    if w.startswith("meng"):
        return w[4:], _ID_MENG, True
    if w.startswith("meny") and len(w) > 4 and w[4] in V:
        return "s" + w[4:], _ID_MENG, True
    if w.startswith("men"):
        return w[3:], _ID_MENG, True
    if w.startswith("mem") and len(w) > 3 and w[3] in V:
        return "p" + w[3:], _ID_MENG, True
    if w.startswith("mem"):
        return w[3:], _ID_MENG, True
    if w.startswith("me"):
        return w[2:], _ID_MENG, True
    if w.startswith("peng"):
        return w[4:], _ID_PENG, True
    if w.startswith("peny") and len(w) > 4 and w[4] in V:
        return "s" + w[4:], _ID_PENG, True
    if w.startswith("peny"):
        return w[4:], _ID_PENG, True
    if w.startswith("pen") and len(w) > 3 and w[3] in V:
        return "t" + w[3:], _ID_PENG, True
    if w.startswith("pen"):
        return w[3:], _ID_PENG, True
    if w.startswith("pem") and len(w) > 3 and w[3] in V:
        return "p" + w[3:], _ID_PENG, True
    if w.startswith("pem"):
        return w[3:], _ID_PENG, True
    if w.startswith("di"):
        return w[2:], _ID_DI, True
    if w.startswith("ter"):
        return w[3:], _ID_TER, True
    if w.startswith("ke"):
        return w[2:], _ID_KE, True
    return w, 0, False


def _id_second_order(w: str):
    if w.startswith("ber"):
        return w[3:], _ID_BER, True
    if w == "belajar":
        return w[3:], _ID_BER, True
    if (
        w.startswith("be") and len(w) > 4
        and w[2] not in _ID_VOWELS and w[3] == "e" and w[4] == "r"
    ):
        return w[2:], _ID_BER, True
    if w.startswith("per"):
        return w[3:], 0, True
    if w == "pelajar":
        return w[3:], 0, True
    if w.startswith("pe"):
        return w[2:], _ID_PE, True
    return w, 0, False


def _id_suffix(w: str, flags: int):
    if w.endswith("kan") and not flags & (_ID_KE | _ID_PENG | _ID_PE):
        return w[:-3], True
    if w.endswith("an") and not flags & (_ID_DI | _ID_MENG | _ID_TER):
        return w[:-2], True
    if (
        w.endswith("i") and not w.endswith("si")
        and not flags & (_ID_BER | _ID_KE | _ID_PENG)
    ):
        return w[:-1], True
    return w, False


def indonesian_py(word: str) -> str:
    w = word
    ns = _id_ns(w)

    # inflectional: particle then possessive
    if ns > 2 and (w.endswith("kah") or w.endswith("lah") or w.endswith("pun")):
        w, ns = w[:-3], ns - 1
    if ns > 2:
        if w.endswith("ku") or w.endswith("mu"):
            w, ns = w[:-2], ns - 1
        elif w.endswith("nya"):
            w, ns = w[:-3], ns - 1

    # derivational
    flags = 0
    fo = False
    if ns > 2:
        w2, flag, fo = _id_first_order(w)
        if fo:
            w, flags, ns = w2, flags | flag, ns - 1
    if not fo:
        if ns > 2:
            w2, flag, so = _id_second_order(w)
            if so:
                w, flags, ns = w2, flags | flag, ns - 1
        if ns > 2:
            w2, sf = _id_suffix(w, flags)
            if sf:
                w, ns = w2, ns - 1
    else:
        if ns > 2:
            w2, sf = _id_suffix(w, flags)
            if sf:
                w, ns = w2, ns - 1
                if ns > 2:
                    w2, flag, so = _id_second_order(w)
                    if so:
                        w, flags, ns = w2, flags | flag, ns - 1
    return w


# ---- indonesian SQL form: one rule table drives the term/flag/fired CASE
# projections so the three stay consistent by construction; the ns
# (syllable) and flags columns thread the python control flow through the
# CTE chain.

def _id_fo_rules():
    V = _ID_VOWELS

    def v_at(x, i):  # 1-based char position i is a vowel
        return f"contains('{V}', substr({x}, {i}, 1))"

    return [
        (lambda x: f"starts_with({x}, 'meng')",
         lambda x: f"substr({x}, 5)", _ID_MENG),
        (lambda x: f"starts_with({x}, 'meny') AND length({x}) > 4 AND {v_at(x, 5)}",
         lambda x: f"'s' || substr({x}, 5)", _ID_MENG),
        (lambda x: f"starts_with({x}, 'men')",
         lambda x: f"substr({x}, 4)", _ID_MENG),
        (lambda x: f"starts_with({x}, 'mem') AND length({x}) > 3 AND {v_at(x, 4)}",
         lambda x: f"'p' || substr({x}, 4)", _ID_MENG),
        (lambda x: f"starts_with({x}, 'mem')",
         lambda x: f"substr({x}, 4)", _ID_MENG),
        (lambda x: f"starts_with({x}, 'me')",
         lambda x: f"substr({x}, 3)", _ID_MENG),
        (lambda x: f"starts_with({x}, 'peng')",
         lambda x: f"substr({x}, 5)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'peny') AND length({x}) > 4 AND {v_at(x, 5)}",
         lambda x: f"'s' || substr({x}, 5)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'peny')",
         lambda x: f"substr({x}, 5)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'pen') AND length({x}) > 3 AND {v_at(x, 4)}",
         lambda x: f"'t' || substr({x}, 4)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'pen')",
         lambda x: f"substr({x}, 4)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'pem') AND length({x}) > 3 AND {v_at(x, 4)}",
         lambda x: f"'p' || substr({x}, 4)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'pem')",
         lambda x: f"substr({x}, 4)", _ID_PENG),
        (lambda x: f"starts_with({x}, 'di')",
         lambda x: f"substr({x}, 3)", _ID_DI),
        (lambda x: f"starts_with({x}, 'ter')",
         lambda x: f"substr({x}, 4)", _ID_TER),
        (lambda x: f"starts_with({x}, 'ke')",
         lambda x: f"substr({x}, 3)", _ID_KE),
    ]


def _id_so_rules():
    V = _ID_VOWELS
    beer = (
        lambda x: f"starts_with({x}, 'be') AND length({x}) > 4 "
        f"AND NOT contains('{V}', substr({x}, 3, 1)) "
        f"AND substr({x}, 4, 1) = 'e' AND substr({x}, 5, 1) = 'r'"
    )
    return [
        (lambda x: f"starts_with({x}, 'ber')", lambda x: f"substr({x}, 4)", _ID_BER),
        (lambda x: f"{x} = 'belajar'", lambda x: f"substr({x}, 4)", _ID_BER),
        (beer, lambda x: f"substr({x}, 3)", _ID_BER),
        (lambda x: f"starts_with({x}, 'per')", lambda x: f"substr({x}, 4)", 0),
        (lambda x: f"{x} = 'pelajar'", lambda x: f"substr({x}, 4)", 0),
        (lambda x: f"starts_with({x}, 'pe')", lambda x: f"substr({x}, 3)", _ID_PE),
    ]


def _id_cascade_sql(rules, x: str):
    """(term CASE, flag CASE, fired CASE) from one rule table."""
    val, flg, fired = [], [], []
    for cond, res, flag in rules:
        c = cond(x)
        val.append(f"WHEN {c} THEN {res(x)}")
        flg.append(f"WHEN {c} THEN {flag}")
        fired.append(f"WHEN {c} THEN TRUE")
    return (
        "CASE " + " ".join(val) + f" ELSE {x} END",
        "CASE " + " ".join(flg) + " ELSE 0 END",
        "CASE " + " ".join(fired) + " ELSE FALSE END",
    )


def _id_suffix_sql(x: str, flags: str):
    kan_bad = _ID_KE | _ID_PENG | _ID_PE
    an_bad = _ID_DI | _ID_MENG | _ID_TER
    i_bad = _ID_BER | _ID_KE | _ID_PENG
    cases = [
        (f"ends_with({x}, 'kan') AND ({flags} & {kan_bad}) = 0", _chop(x, 3)),
        (f"ends_with({x}, 'an') AND ({flags} & {an_bad}) = 0", _chop(x, 2)),
        (
            f"ends_with({x}, 'i') AND NOT ends_with({x}, 'si') "
            f"AND ({flags} & {i_bad}) = 0",
            _chop(x, 1),
        ),
    ]
    val = "CASE " + " ".join(f"WHEN {c} THEN {r}" for c, r in cases) + f" ELSE {x} END"
    fired = "CASE " + " ".join(f"WHEN {c} THEN TRUE" for c, _ in cases) + " ELSE FALSE END"
    return val, fired


def indonesian_sql_ctes(src: str, out: str, p: str = "id_") -> str:
    ns0 = f"length(regexp_replace(term, '[^{_ID_VOWELS}]', '', 'g'))"
    part = (
        "CASE WHEN ns > 2 AND (ends_with(term, 'kah') OR ends_with(term, 'lah') "
        f"OR ends_with(term, 'pun')) THEN {_chop('term', 3)} ELSE term END"
    )
    part_f = (
        "CASE WHEN ns > 2 AND (ends_with(term, 'kah') OR ends_with(term, 'lah') "
        "OR ends_with(term, 'pun')) THEN 1 ELSE 0 END"
    )
    poss = (
        "CASE WHEN ns > 2 AND (ends_with(term, 'ku') OR ends_with(term, 'mu')) "
        f"THEN {_chop('term', 2)} "
        f"WHEN ns > 2 AND ends_with(term, 'nya') THEN {_chop('term', 3)} ELSE term END"
    )
    poss_f = (
        "CASE WHEN ns > 2 AND (ends_with(term, 'ku') OR ends_with(term, 'mu') "
        "OR ends_with(term, 'nya')) THEN 1 ELSE 0 END"
    )
    fo_v, fo_fl, fo_fd = _id_cascade_sql(_id_fo_rules(), "term")
    so_v, so_fl, so_fd = _id_cascade_sql(_id_so_rules(), "term")
    sf_v, sf_fd = _id_suffix_sql("term", "flags")
    return f"""
{p}b AS MATERIALIZED (SELECT doc_id, term, {ns0} AS ns FROM {src}),
{p}pt AS MATERIALIZED (SELECT doc_id, {part} AS term, ns - ({part_f}) AS ns FROM {p}b),
{p}ps AS MATERIALIZED (SELECT doc_id, {poss} AS term, ns - ({poss_f}) AS ns FROM {p}pt),
{p}fo AS MATERIALIZED (SELECT doc_id,
  CASE WHEN ns > 2 THEN {fo_v} ELSE term END AS term,
  CASE WHEN ns > 2 THEN {fo_fl} ELSE 0 END AS flags,
  (ns > 2 AND {fo_fd}) AS fof,
  ns - (CASE WHEN ns > 2 AND {fo_fd} THEN 1 ELSE 0 END) AS ns FROM {p}ps),
{p}so1 AS MATERIALIZED (SELECT doc_id, fof,
  CASE WHEN NOT fof AND ns > 2 THEN {so_v} ELSE term END AS term,
  flags | (CASE WHEN NOT fof AND ns > 2 THEN {so_fl} ELSE 0 END) AS flags,
  ns - (CASE WHEN NOT fof AND ns > 2 AND {so_fd} THEN 1 ELSE 0 END) AS ns FROM {p}fo),
{p}sf AS MATERIALIZED (SELECT doc_id, fof, flags,
  CASE WHEN ns > 2 THEN {sf_v} ELSE term END AS term,
  (ns > 2 AND {sf_fd}) AS sff,
  ns - (CASE WHEN ns > 2 AND {sf_fd} THEN 1 ELSE 0 END) AS ns FROM {p}so1),
{out} AS MATERIALIZED (SELECT doc_id,
  CASE WHEN fof AND sff AND ns > 2 THEN {so_v} ELSE term END AS term FROM {p}sf)
"""


# ------------------------------------------------------------------ turkish
# Çilden's Turkish stemmer ("Stemming Turkish Words Using Snowball" — the
# algorithm behind Snowball/Lucene TurkishStemmer; reference
# config/mapping/Language.scala:93 maps language: tr to TurkishAnalyzer =
# apostrophe filter + TurkishLowerCase + stop + that stemmer).
#
# One suffix spec, two executable forms. Each suffix surface carries its
# harmony vowel and an optional buffer-letter constraint:
#   "V" — the optional-letter variant (y/s/n/U buffer): the remaining stem
#         must end in a vowel (kapı+yı, araba+m, araba+nın);
#   "C" — the bare/U-ful variant: the stem must end in a consonant
#         (ev+in, el+im, kitab+ı).
# A strip is valid when the surface matches, the constraint holds, the
# remainder keeps ≥1 vowel, and the suffix vowel harmonizes with the last
# stem vowel (a↔a/ı/o/u, e↔e/i/ö/ü, ı↔a/ı, i↔e/i, u↔o/u, ü↔ö/ü; the
# invariable -ken/-ki are exempt). Words with <2 vowels are never stemmed
# (the more_than_one_syllable entry test). After stripping, the final
# consonant devoices (b→p c→ç d→t ğ→k — kitabı→kitab→kitap).
#
# Fidelity note: the Snowball reference removes one nominal-verb suffix
# then walks a fixed noun-suffix routine graph (incl. the -ki chain); this
# implementation iterates the SAME suffix tables longest-match-first to a
# fixpoint (≤10 steps), which reaches the same multi-suffix conflations
# (evlerimizden→ev) without the routine graph; the append-U-after-d/g
# postlude is omitted. Both executable forms share the tables below and
# are identity-tested.

_TR_VOWELS = "aeıioöuü"
_TR_HARMONY = {
    "a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei", "u": "ou", "ü": "öü",
}
_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def _tr_suffixes() -> list[tuple[str, str | None, str | None]]:
    out: list[tuple[str, str | None, str | None]] = []
    seen: dict[str, int] = {}

    def add(surfs: str, cons: str | None = None, exempt: bool = False):
        for s in surfs.split():
            # vowel-less surfaces (bare m/n) have nothing to harmonize
            v = None if exempt else next((c for c in s if c in _TR_VOWELS), None)
            if s in seen:
                # duplicate surface across families: keep the laxer entry
                i = seen[s]
                if out[i][2] is not None and cons is None:
                    out[i] = (s, v, None)
                continue
            seen[s] = len(out)
            out.append((s, v, cons))

    # nominal verb suffixes
    add("casına cesine")
    add("sınız siniz sunuz sünüz")
    add("ymış ymiş ymuş ymüş ydı ydi ydu ydü ysa yse", "V")
    add("yken", "V", exempt=True)
    add("mış miş muş müş dı di du dü tı ti tu tü sa se")
    add("ken", exempt=True)
    add("yım yim yum yüm yız yiz yuz yüz", "V")
    add("sın sin sun sün")
    add("nız niz nuz nüz")
    add("dır dir dur dür tır tir tur tür")
    add("lar ler")
    # noun suffixes (possessive / case)
    add("ları leri")
    add("ımız imiz umuz ümüz ınız iniz unuz ünüz", "C")
    add("mız miz muz müz", "V")
    add("ım im um üm ın in un ün", "C")
    add("m n", "V")
    add("sı si su sü nın nin nun nün yı yi yu yü nı ni nu nü", "V")
    add("ı i u ü", "C")
    add("ya ye na ne yla yle nca nce", "V")
    add("a e", "C")
    add("nda nde ndan nden", "V")
    add("da de ta te dan den tan ten la le ca ce")
    # the -ki relativizer only in its morphotactic chain positions
    # (okuldaki, seninki, bugünkü) — a bare unconstrained 'ki' would fire
    # on stems that merely end in ki (türki after vowel strips)
    add("ndaki ndeki daki deki taki teki", exempt=True)
    add("kü", "C", exempt=True)
    # longest-first; ties keep family order above
    return sorted(out, key=lambda x: -len(x[0]))


TR_SUFFIXES = _tr_suffixes()
# single-letter morphemes (possessive m/n, case vowels ı/i/u/ü/a/e) chain
# badly under an unrestricted fixpoint (zaman → zama → zam → za); but one
# single CAN legitimately expose a deeper suffix (arabam → araba → arab:
# possessive m, then the case vowel). The stemmer therefore alternates:
# multi-suffix fixpoint → at most one single strip → multi fixpoint → at
# most one single strip — matching Turkish suffix order (case outside
# possessive) while bounding the single-letter cascade at two.
TR_MULTI = [t for t in TR_SUFFIXES if len(t[0]) > 1]
TR_SINGLE = [t for t in TR_SUFFIXES if len(t[0]) == 1]


def _tr_last_vowel(w: str) -> str | None:
    for c in reversed(w):
        if c in _TR_VOWELS:
            return c
    return None


def _tr_one_strip(w: str, table=None) -> str:
    for surf, v, cons in (TR_MULTI if table is None else table):
        if not w.endswith(surf):
            continue
        r = w[: -len(surf)]
        lv = _tr_last_vowel(r)
        if lv is None:
            continue
        if cons == "V" and r[-1] not in _TR_VOWELS:
            continue
        if cons == "C" and r[-1] in _TR_VOWELS:
            continue
        if v is not None and lv not in _TR_HARMONY[v]:
            continue
        return r
    return w


def turkish_py(word: str) -> str:
    if sum(c in _TR_VOWELS for c in word) < 2:
        return word
    w = word
    for _ in range(2):
        for _ in range(10):
            nxt = _tr_one_strip(w)
            if nxt == w:
                break
            w = nxt
        w = _tr_one_strip(w, TR_SINGLE)
    if w and w[-1] in _TR_DEVOICE:
        w = w[:-1] + _TR_DEVOICE[w[-1]]
    return w


def _tr_step_sql(x: str, table=None) -> str:
    """The one-strip CASE over {x} — the SQL mirror of _tr_one_strip."""
    whens = []
    for surf, v, cons in (TR_MULTI if table is None else table):
        n = len(surf)
        r = f"substr({x}, 1, length({x}) - {n})"
        conds = [f"ends_with({x}, '{surf}')",
                 f"regexp_matches({r}, '[{_TR_VOWELS}]')"]
        last = f"substr({r}, length({r}), 1)"
        vlist = ",".join(f"'{c}'" for c in _TR_VOWELS)
        if cons == "V":
            conds.append(f"{last} IN ({vlist})")
        elif cons == "C":
            conds.append(f"{last} NOT IN ({vlist})")
        if v is not None:
            hs = ",".join(f"'{c}'" for c in _TR_HARMONY[v])
            lastv = (
                f"substr(regexp_replace({r}, '[^{_TR_VOWELS}]', '', 'g'), -1)"
            )
            conds.append(f"{lastv} IN ({hs})")
        whens.append(f"WHEN {' AND '.join(conds)} THEN {r}")
    body = "\n    ".join(whens)
    return f"CASE\n    {body}\n    ELSE {x} END"


def turkish_sql_ctes(src: str, out: str, p: str = "tr_") -> str:
    """``src(doc_id, term)`` → fixpoint suffix strip (recursive CTE, ≤10
    iterations) → devoice → ``out(doc_id, term)``. Callers compose under
    WITH RECURSIVE (like the French/Russian prelude scans)."""
    step = _tr_step_sql("term")
    nv = f"length(term) - length(regexp_replace(term, '[{_TR_VOWELS}]', '', 'g'))"
    dv_whens = "\n    ".join(
        f"WHEN stemmable AND ends_with(term, '{b}') "
        f"THEN substr(term, 1, length(term) - 1) || '{d}'"
        for b, d in _TR_DEVOICE.items()
    )
    single = _tr_step_sql("term", TR_SINGLE)
    return f"""{p}b AS MATERIALIZED (
  SELECT row_number() OVER () AS tid, doc_id, term, ({nv}) >= 2 AS stemmable
  FROM {src}
),
{p}r1 AS (
  SELECT tid, doc_id, term, 0 AS it FROM {p}b WHERE stemmable
  UNION ALL
  SELECT tid, doc_id, {step} AS term, it + 1
  FROM {p}r1 WHERE it < 10 AND ({step}) <> term
),
{p}s1 AS MATERIALIZED (
  SELECT tid, doc_id, {single} AS term FROM (
    SELECT tid, min(doc_id) AS doc_id,
           arg_min(term, length(term)) AS term
    FROM {p}r1 GROUP BY tid
  ) fx1
),
{p}r2 AS (
  SELECT tid, doc_id, term, 0 AS it FROM {p}s1
  UNION ALL
  SELECT tid, doc_id, {step} AS term, it + 1
  FROM {p}r2 WHERE it < 10 AND ({step}) <> term
),
{p}s2 AS MATERIALIZED (
  SELECT tid, doc_id, {single} AS term, true AS stemmable FROM (
    SELECT tid, min(doc_id) AS doc_id,
           arg_min(term, length(term)) AS term
    FROM {p}r2 GROUP BY tid
  ) fx2
  UNION ALL
  SELECT tid, doc_id, term, stemmable FROM {p}b WHERE NOT stemmable
),
{out} AS MATERIALIZED (
  SELECT doc_id, CASE
    {dv_whens}
    ELSE term END AS term
  FROM {p}s2
)"""
