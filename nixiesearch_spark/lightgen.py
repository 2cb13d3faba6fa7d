"""Declarative light-stemmer framework: ONE rule table per language drives
BOTH executable forms — the Python interpreter (used by the engine's
pandas-UDF analyzer chains) and a generated DuckDB SQL CTE chain (used by
the correctness-gate oracles). This is the repo's one-spec→two-forms
discipline (CLAUDE.md invariants) factored out of the per-language modules
in light.py: a new language is ~30 lines of rule table instead of a
hand-written pair of implementations that must be kept in sync.

Model (covers the published light/affix-stripping stemmer family — Lucene's
LatvianStemmer shape, the Savoy/Dolamic light stemmers, and suffix-tier
analogs for languages whose reference analyzer is dictionary- or
statistics-backed and therefore not reimplementable in this sandbox; each
spec's docnote states its fidelity level):

- optional normalization: a 1:1 char translate map (``None`` deletes) plus
  ordered multi-char replace pairs, applied before any phase;
- ordered PHASES; within a phase the FIRST matching rule fires (rules are
  tried in table order) and at most ONE rule fires per phase;
- a rule matches when the token ends with (``mode="suffix"``) or starts
  with (``mode="prefix"``) its literal, the token is at least ``min_len``
  chars, and — if ``vowel_gt`` is set — the PHASE-0 input token contains
  strictly more than ``vowel_gt`` vowels (Lucene LatvianStemmer's guard;
  the count is fixed before any strip, matching its one-pass design);
- a rule with ``post=True`` arms the spec's ``post=True`` phases
  (palatalization-style cleanup that only runs after specific strips).

The SQL generator emits one MATERIALIZED CTE per phase whose CASE branches
replicate the rule order exactly, so the two forms are rule-identical by
construction; tests/test_lightgen.py pins spec cases and hypothesis-checks
the two-form identity per language over its own alphabet.

Reference parity: nixiesearch binds one stock Lucene analyzer per language
(``config/mapping/Language.scala:57-98``); the specs below cover the
reference's lv/lt/et/gl/eu/ga/pl/ua/sr/hy/bn/ta/ckb bindings (file:line in
each spec's docnote).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class R:
    """One rule: strip ``lit`` (suffix or prefix, per the phase mode) when
    the token has at least ``min_len`` chars, appending/prepending
    ``replace``. ``vowel_gt``: PHASE-0-input vowel count must exceed it.
    ``post=True`` arms the spec's post phases."""

    lit: str
    min_len: int = 0
    replace: str = ""
    vowel_gt: int | None = None
    post: bool = False


@dataclass(frozen=True)
class Phase:
    rules: tuple
    mode: str = "suffix"  # or "prefix"
    post: bool = False  # runs only if an earlier post=True rule fired


@dataclass(frozen=True)
class Spec:
    name: str
    phases: tuple
    vowels: str = ""  # alphabet for vowel_gt guards (phase-0 input count)
    norm_map: tuple = ()  # ((char, char|None), ...) — 1:1 translate / delete
    replaces: tuple = ()  # ordered multi-char (src, dst) replace pairs


# ------------------------------------------------------------ python form


def make_norm_py(spec: Spec):
    """Normalization-only form (translate + replaces) — the norm stage of
    a norm→stop→stem chain (idempotent on its own output)."""
    trans = {ord(k): v for k, v in spec.norm_map}

    def norm(word: str) -> str:
        w = word.translate(trans) if trans else word
        for a, b in spec.replaces:
            w = w.replace(a, b)
        return w

    norm.__name__ = f"{spec.name}_norm_py"
    return norm


def make_phases_py(spec: Spec):
    """Phases-only form — the stem stage of a norm→stop→stem chain
    (expects already-normalized input)."""
    vset = set(spec.vowels)

    def stem(w: str) -> str:
        nv = sum(c in vset for c in w) if vset else 0
        armed = False
        for ph in spec.phases:
            if ph.post and not armed:
                continue
            for r in ph.rules:
                L = len(r.lit)
                if len(w) < max(r.min_len, L):
                    continue
                if ph.mode == "suffix":
                    if not w.endswith(r.lit):
                        continue
                else:
                    if not w.startswith(r.lit):
                        continue
                if r.vowel_gt is not None and nv <= r.vowel_gt:
                    continue
                if ph.mode == "suffix":
                    w = w[: len(w) - L] + r.replace
                else:
                    w = r.replace + w[L:]
                if r.post:
                    armed = True
                break
        return w

    stem.__name__ = f"{spec.name}_phases_py"
    return stem


def make_py(spec: Spec):
    norm = make_norm_py(spec)
    phases = make_phases_py(spec)

    def stem(word: str) -> str:
        return phases(norm(word))

    stem.__name__ = f"{spec.name}_py"
    return stem


# --------------------------------------------------------------- SQL form


def _esc(s: str) -> str:
    return s.replace("'", "''")


def _rule_cond(x: str, r: R, mode: str, nv: str | None) -> str:
    L = len(r.lit)
    conds = [f"length({x}) >= {max(r.min_len, L)}"]
    if mode == "suffix":
        conds.append(f"ends_with({x}, '{_esc(r.lit)}')")
    else:
        conds.append(f"substr({x}, 1, {L}) = '{_esc(r.lit)}'")
    if r.vowel_gt is not None:
        conds.append(f"{nv} > {r.vowel_gt}")
    return " AND ".join(conds)


def _rule_result(x: str, r: R, mode: str) -> str:
    L = len(r.lit)
    if mode == "suffix":
        base = f"substr({x}, 1, length({x}) - {L})"
        return f"{base} || '{_esc(r.replace)}'" if r.replace else base
    base = f"substr({x}, {L + 1})"
    return f"'{_esc(r.replace)}' || {base}" if r.replace else base


def _phase_case(x: str, ph: Phase, nv: str | None, armed: str | None) -> str:
    whens = []
    for r in ph.rules:
        cond = _rule_cond(x, r, ph.mode, nv)
        if ph.post:
            cond = f"{armed} AND {cond}"
        whens.append(f"WHEN {cond} THEN {_rule_result(x, r, ph.mode)}")
    return "CASE " + " ".join(whens) + f" ELSE {x} END"


def _phase_armed(x: str, ph: Phase, nv: str | None, prev: str) -> str:
    """Boolean expr: armed after this phase = armed before OR the FIRST
    matching rule has post=True (CASE replays the same rule order)."""
    whens = []
    for r in ph.rules:
        whens.append(
            f"WHEN {_rule_cond(x, r, ph.mode, nv)} THEN {str(r.post).upper()}"
        )
    first_post = "CASE " + " ".join(whens) + " ELSE FALSE END"
    return f"({prev} OR {first_post})"


def make_sql_ctes(spec: Spec, stops: list[str] | None = None):
    """Generator for the DuckDB form: ``fn(src, out, prefix)`` emitting a
    CTE fragment from ``{src}(doc_id, term)`` to ``{out}(doc_id, term)``.
    When ``stops`` is given, tokens equal to a stop entry are dropped AFTER
    normalization, BEFORE the phases (the norm→stop→stem chain order)."""

    def ctes(src: str, out: str, p: str | None = None) -> str:
        p = p or (spec.name[:2] + "lg_")
        parts = []
        x = "term"
        cur = src
        norm = x
        if spec.norm_map:
            # translate() drops chars of `from` beyond len(to) — keep
            # deletions LAST so 1:1 pairs line up positionally
            pairs = [kv for kv in spec.norm_map if kv[1] is not None]
            dels = [k for k, v in spec.norm_map if v is None]
            frm = "".join(k for k, _ in pairs) + "".join(dels)
            to = "".join(v for _, v in pairs)
            norm = f"translate({norm}, '{_esc(frm)}', '{_esc(to)}')"
        for a, b in spec.replaces:
            norm = f"replace({norm}, '{_esc(a)}', '{_esc(b)}')"
        if norm != x:
            parts.append(
                f"{p}nm AS MATERIALIZED (SELECT doc_id, {norm} AS term FROM {cur})"
            )
            cur = f"{p}nm"
        if stops is not None:
            sl = "[" + ",".join(f"'{_esc(s)}'" for s in stops) + "]"
            parts.append(
                f"{p}sw AS MATERIALIZED (SELECT doc_id, term FROM {cur} "
                f"WHERE NOT list_contains({sl}, term))"
            )
            cur = f"{p}sw"
        nv = None
        if spec.vowels:
            nv = "nv"
            parts.append(
                f"{p}v AS MATERIALIZED (SELECT doc_id, term, length(term) - "
                f"length(regexp_replace(term, '[{_esc(spec.vowels)}]', '', 'g'))"
                f" AS nv FROM {cur})"
            )
            cur = f"{p}v"
        has_post = any(ph.post for ph in spec.phases)
        armed = "FALSE"
        for i, ph in enumerate(spec.phases):
            carry_nv = f", {nv}" if nv and i < len(spec.phases) - 1 else ""
            carry_armed = ""
            if has_post:
                nxt = (
                    armed
                    if ph.post
                    else _phase_armed(x, ph, nv, armed)
                )
                if i < len(spec.phases) - 1:
                    carry_armed = f", {nxt} AS armed"
                    next_armed = "armed"
                else:
                    next_armed = armed
            alias = out if i == len(spec.phases) - 1 else f"{p}p{i}"
            parts.append(
                f"{alias} AS MATERIALIZED (SELECT doc_id, "
                f"{_phase_case(x, ph, nv, armed)} AS term{carry_nv}"
                f"{carry_armed} FROM {cur})"
            )
            cur = alias
            if has_post:
                armed = next_armed
        if not spec.phases:
            parts.append(
                f"{out} AS MATERIALIZED (SELECT doc_id, term FROM {cur})"
            )
        return ",\n".join(parts)

    ctes.__name__ = f"{spec.name}_sql_ctes"
    return ctes


# =========================================================== language specs

# ----------------------------------------------------------------- latvian
# Reference binds lv → Lucene LatvianAnalyzer (Language.scala:82), whose
# LatvianStemmer is itself a published light stemmer ("A stemming algorithm
# for Latvian", as bound by Lucene): one pass over an ordered affix table,
# each affix guarded by word length >= |affix|+3 and a whole-word vowel
# count > vc, with ending "unpalatalization" after the plural affixes.
# Rule table reconstructed from that description; the kš→kst fold (gated in
# Lucene on WHICH char was removed) is omitted — documented narrowing.
LATVIAN = Spec(
    name="latvian",
    vowels="aāeēiīouū",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3, vowel_gt=vc, post=post)
                for lit, vc, post in (
                    ("ajiem", 3, 0), ("ajai", 3, 0), ("ajam", 2, 0),
                    ("ajām", 2, 0), ("ajos", 2, 0), ("ajās", 2, 0),
                    ("iem", 2, 1), ("ajā", 2, 0), ("ais", 2, 0),
                    ("ai", 2, 0), ("ei", 2, 0), ("ām", 1, 0), ("am", 1, 0),
                    ("ēm", 1, 0), ("īm", 1, 0), ("im", 1, 0), ("um", 1, 0),
                    ("us", 1, 1), ("as", 1, 0), ("ās", 1, 0), ("es", 1, 0),
                    ("os", 1, 1), ("ij", 1, 0), ("īs", 1, 0), ("ēs", 1, 0),
                    ("is", 1, 0), ("ie", 1, 0), ("u", 1, 1), ("a", 1, 1),
                    ("i", 1, 1), ("e", 1, 0), ("ā", 1, 0), ("ē", 1, 0),
                    ("ī", 1, 0), ("ū", 1, 0), ("o", 1, 0), ("s", 0, 0),
                    ("š", 0, 0),
                )
            )
        ),
        Phase(
            (
                R("ņņ", replace="nn"), R("pj", replace="p"),
                R("bj", replace="b"), R("mj", replace="m"),
                R("vj", replace="v"), R("šņ", replace="sn"),
                R("žņ", replace="zn"), R("šļ", replace="sl"),
                R("žļ", replace="zl"), R("ļņ", replace="ln"),
                R("ļļ", replace="ll"), R("č", replace="c"),
                R("ļ", replace="l"), R("ņ", replace="n"),
            ),
            post=True,
        ),
    ),
)

# -------------------------------------------------------------- lithuanian
# Reference binds lt → Lucene LithuanianAnalyzer (Language.scala:83), which
# wraps the Snowball Lithuanian stemmer. Light ANALOG (documented): one
# longest-match strip over the noun/adjective case+plural ending table —
# the endings and their relative order follow the Snowball table's surface
# forms; the Snowball conditional machinery (R1, exceptions) is not
# replicated. Minimum stem of 3 chars throughout.
LITHUANIAN = Spec(
    name="lithuanian",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "iuose", "iams", "iais", "iems", "ėmis", "omis", "imis",
                    "umis", "uose", "iose", "ioms", "ams", "ais", "ėms",
                    "ėse", "yse", "ose", "uje", "yje", "ums", "uos", "ius",
                    "iai", "iui", "iam", "oms", "ims", "ies", "ios", "ių",
                    "as", "is", "ys", "us", "os", "ės", "ui", "ei", "ai",
                    "ią", "io", "iu", "ia", "ų", "a", "ą", "e", "ę", "ė",
                    "i", "į", "y", "o", "u", "s",
                )
            )
        ),
    ),
)

# ---------------------------------------------------------------- estonian
# Reference binds et → Lucene EstonianAnalyzer (Language.scala:71; Snowball
# Estonian). Light ANALOG (documented): one longest-match strip over the
# case-ending table (the 14-case system's agglutinative endings, incl. the
# de-/te- plural stems), minimum stem 3 chars; the Snowball vowel/gradation
# machinery is not replicated.
ESTONIAN = Spec(
    name="estonian",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "desse", "tesse", "dele", "tele", "dest", "test",
                    "dega", "tega", "deta", "teta", "sse", "ide", "ile",
                    "ilt", "ist", "iga", "ita", "iks", "ini", "ina", "des",
                    "tes", "le", "lt", "st", "ga", "ta", "ks", "ni", "na",
                    "te", "de", "id",
                )
            )
            # single-letter case endings (adessive -l, partitive -t, plural
            # -d, inessive -s) need a 4-char stem: min 5 keeps corpus-stem
            # pairs like part/partist conflated instead of part→par
            + tuple(R(lit, min_len=5) for lit in ("l", "t", "d", "s"))
        ),
    ),
)


# ---------------------------------------------------------------- galician
# Reference binds gl → Lucene GalicianAnalyzer (Language.scala:77), whose
# GalicianStemmer is the RSLP rule set adapted to Galician. Light ANALOG
# (documented): the RSLP macro-steps kept are adverb (-mente), plural
# (with the -n/-l restorations Galician plurals need: cancións→canción,
# papeis→papel) and gender/theme-vowel deletion; the noun/verb suffix
# cascades are not replicated.
GALICIAN = Spec(
    name="galician",
    phases=(
        Phase((R("mente", min_len=8),)),
        Phase(
            (
                R("ns", min_len=5, replace="n"),
                R("ais", min_len=6, replace="al"),
                R("eis", min_len=6, replace="el"),
                R("ois", min_len=6, replace="ol"),
                R("uis", min_len=6, replace="ul"),
                R("es", min_len=5, replace="e"),
                R("s", min_len=4),
            )
        ),
        Phase(tuple(R(v, min_len=4) for v in ("a", "o", "e", "á", "é", "í", "ó"))),
    ),
)

# ------------------------------------------------------------------ basque
# Reference binds eu → Lucene BasqueAnalyzer (Language.scala:72; Snowball
# Basque). Light ANALOG (documented): one longest-match strip over the
# case/determiner ending table (absolutive/ergative/genitive/locative
# morphemes and their plural -eta- forms); the Snowball RV machinery is
# not replicated. Minimum stem 3 chars.
BASQUE = Spec(
    name="basque",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "etarako", "entzako", "etatik", "arekin", "entzat",
                    "etako", "etara", "aren", "ekin", "etan", "tzat",
                    "tik", "ari", "ak", "ek", "en", "an", "ra", "ko",
                    "az", "ik", "a", "k",
                )
            )
        ),
    ),
)

# ------------------------------------------------------------------- irish
# Reference binds ga → Lucene IrishAnalyzer (Language.scala:76; elision +
# IrishLowerCaseFilter + Snowball Irish). ANALOG (documented): the prefix
# phase undoes the unambiguous word-initial eclipsis clusters (mb→b, gc→c,
# nd→d, ng→g, bp→p, dt→t, ts→s, bhf→f) — Lucene detects the case-marked
# prothesis (nAthair) BEFORE lowercasing, which a lowercase-first tokenizer
# cannot, so vowel-prothesis t-/n-/h- handling is limited to the stopword
# list; the suffix phase strips the common noun/verb endings from the
# Snowball table's surface forms. Minimum stem 3 chars.
IRISH = Spec(
    name="irish",
    phases=(
        Phase(
            (
                # min_len keeps a >=3-char stem: the 2-char clusters lose
                # one char net (dtír→tír), bhf loses two
                R("bhf", min_len=5, replace="f"),
                R("ts", min_len=4, replace="s"),
                R("mb", min_len=4, replace="b"),
                R("gc", min_len=4, replace="c"),
                R("nd", min_len=4, replace="d"),
                R("ng", min_len=4, replace="g"),
                R("bp", min_len=4, replace="p"),
                R("dt", min_len=4, replace="t"),
            ),
            mode="prefix",
        ),
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "íochta", "íocht", "faidh", "eacht", "achta", "fidh",
                    "eann", "acha", "anna", "acht", "eadh", "aibh", "ann",
                    "adh", "áil", "úil", "each", "ach", "amh", "aí", "ín",
                )
            )
            + tuple(R(v, min_len=5) for v in ("a", "e", "í"))
        ),
    ),
)

# ------------------------------------------------------------------ polish
# Reference binds pl → Lucene PolishAnalyzer (Language.scala:97), which is
# Stempel — a STATISTICAL stemmer over trained tables that cannot be
# reproduced as rules. Light ANALOG (documented): adjective-ending tier,
# noun case-ending tier, final theme-vowel tier — the standard light-
# stemming shape for inflected Slavic (same design as the Czech/Bulgarian
# chains in light.py). PARITY.md records the Stempel deferral.
POLISH = Spec(
    name="polish",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "owego", "owemu", "owych", "owymi", "iego", "iemu",
                    "ego", "emu", "ymi", "imi", "ych", "ich", "ej",
                )
            )
        ),
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "iach", "iami", "iowi", "ach", "ami", "iom", "owi",
                    "iem", "om", "em", "ie", "iu", "ią", "ię", "ów",
                )
            )
        ),
        Phase(
            tuple(
                R(v, min_len=4)
                for v in ("a", "e", "i", "o", "u", "y", "ą", "ę")
            )
        ),
    ),
)


# --------------------------------------------------------------- ukrainian
# Reference binds ua → UkrainianMorfologikAnalyzer (Language.scala:99) — a
# DICTIONARY (Morfologik) lemmatizer that cannot be reproduced as rules;
# PARITY.md records the deferral. Light ANALOG (documented): the standard
# inflected-Slavic three-tier shape (adjective endings, noun case endings,
# final theme vowel), same design as the Polish/Czech/Bulgarian chains.
UKRAINIAN = Spec(
    name="ukrainian",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "ього", "ьому", "ого", "ому", "ими", "іми", "их", "їх",
                    "ої", "ій", "ий",
                )
            )
        ),
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "ями", "ами", "ові", "еві", "єві", "ях", "ах", "ів",
                    "їв", "ею", "ою", "єю", "ам", "ям", "ом", "ем", "єм",
                    "ей", "ь",
                )
            )
        ),
        Phase(
            tuple(
                R(v, min_len=4)
                for v in ("а", "я", "о", "е", "є", "у", "ю", "і", "и", "ї")
            )
        ),
    ),
)

# ----------------------------------------------------------------- serbian
# Reference binds sr → Lucene SerbianAnalyzer (Language.scala:92): lower +
# stop + SerbianNormalizationFilter. The normalization here is the filter's
# "bald" fold — Cyrillic → ASCII Latin (љ→lj, њ→nj, џ→dz, ђ→dj) and Latin
# diacritic folding (č/ć→c, š→s, ž→z, đ→dj) — so Cyrillic and Latin
# spellings of the same word become one term. The suffix phases are a light
# ANALOG (documented; Ljubešić–Pandžić-style greedy case-ending strip —
# Lucene ships no Serbian stemmer, so the analog widens recall vs the
# reference rather than matching a reference stemmer). Chain order is
# norm → stop → stem (stop list compared post-normalization).
SERBIAN = Spec(
    name="serbian",
    norm_map=(
        ("а", "a"), ("б", "b"), ("в", "v"), ("г", "g"), ("д", "d"),
        ("е", "e"), ("ж", "z"), ("з", "z"), ("и", "i"), ("ј", "j"),
        ("к", "k"), ("л", "l"), ("м", "m"), ("н", "n"), ("о", "o"),
        ("п", "p"), ("р", "r"), ("с", "s"), ("т", "t"), ("ћ", "c"),
        ("у", "u"), ("ф", "f"), ("х", "h"), ("ц", "c"), ("ч", "c"),
        ("ш", "s"),
        ("č", "c"), ("ć", "c"), ("š", "s"), ("ž", "z"),
    ),
    replaces=(("љ", "lj"), ("њ", "nj"), ("џ", "dz"), ("ђ", "dj"), ("đ", "dj")),
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "ovima", "evima", "ijama", "ijima", "ima", "ama",
                    "om", "em", "og", "eg", "im", "ih", "oj", "ju",
                )
            )
        ),
        Phase(tuple(R(v, min_len=4) for v in ("u", "e", "i", "a", "o"))),
    ),
)

# ---------------------------------------------------------------- armenian
# Reference binds hy → Lucene ArmenianAnalyzer (Language.scala:80; Snowball
# Armenian). Light ANALOG (documented): longest-match strips over the
# plural+case combination endings, then the bare plural/case morphemes,
# then the definite article — the Snowball routine graph and its
# ե/ա-stem conditions are not replicated.
ARMENIAN = Spec(
    name="armenian",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "ներում", "ներին", "ներով", "ների",
                    "երում", "երին", "երով", "երի",
                )
            )
        ),
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in ("ներ", "եր", "ում", "ով", "ից", "ին")
            )
        ),
        Phase((R("ը", min_len=4), R("ն", min_len=5), R("ի", min_len=4))),
    ),
)

# ------------------------------------------------------------------- tamil
# Reference binds ta → Lucene TamilAnalyzer (Language.scala:101; Snowball
# Tamil). Light ANALOG (documented): the கள்-family plural+case endings
# and two clitic rules with virama restoration (லும்→ல், வும்→வு) —
# the Snowball Tamil prefix rules and the full case cascade are not
# replicated. Lengths count code points (vowel signs and virama are chars),
# so min_len guards are in code points like every other spec.
TAMIL = Spec(
    name="tamil",
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in ("களுக்கு", "களில்", "களின்", "களால்", "களை", "கள்")
            )
        ),
        Phase(
            (
                R("லும்", min_len=6, replace="ல்"),
                R("வும்", min_len=6, replace="வு"),
            )
        ),
    ),
)

# ----------------------------------------------------------------- bengali
# Reference binds bn → Lucene BengaliAnalyzer (Language.scala:61):
# IndicNormalization + BengaliNormalization + stop + BengaliStemmer (the
# published Bengali light stemmer). Normalization subset (documented): the
# nukta compositions (ড+়→ড়, ঢ+়→ঢ়, য+়→য়) so decomposed spellings
# join the composed term. Phases follow the light stemmer's plural tier
# (গুলো/গুলি/দের) and case tier (ের/কে/তে/রা/টা/টি); the full
# BengaliStemmer table is larger — analog, not a transcription. Chain is
# norm → stop → stem.
BENGALI = Spec(
    name="bengali",
    replaces=(
        ("ড়", "ড়"),  # ড+় → ড়
        ("ঢ়", "ঢ়"),  # ঢ+় → ঢ়
        ("য়", "য়"),  # য+় → য়
    ),
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "গুলোতে", "গুলোর", "গুলিতে", "গুলির", "গুলো",
                    "গুলি", "দের",
                )
            )
        ),
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in ("েতে", "ের", "কে", "রে", "তে", "রা")
            )
            # the টা/টি classifiers attach to very short nouns (বইটি) —
            # allow a 2-codepoint stem
            + tuple(
                R(lit, min_len=4) for lit in ("টা", "টি")
            )
        ),
        Phase((R("ে", min_len=4), R("র", min_len=5))),
    ),
)

# ------------------------------------------------------------------ sorani
# Reference binds ckb → Lucene SoraniAnalyzer (Language.scala:65):
# SoraniNormalizationFilter + stop + SoraniStemmer. Normalization subset
# (documented): Arabic yeh/alef-maksura → Farsi yeh, Arabic kaf → keheh,
# tatweel + harakat removal (the filter's ZWNJ→ە rule is out — ZWNJ is a
# token delimiter here). Phases follow SoraniStemmer's suffix families:
# definite/plural combinations (ەکان/کان/ەکە …), indefinite (ێک/یەک),
# then the bare plural/izafe endings — analog of the published rule list,
# not a transcription. Chain is norm → stop → stem.
SORANI = Spec(
    name="sorani",
    norm_map=(
        ("ي", "ی"),  # ي → ی
        ("ى", "ی"),  # ى → ی
        ("ك", "ک"),  # ك → ک
        ("ـ", None),  # tatweel
        ("ً", None), ("ٌ", None), ("ٍ", None),
        ("َ", None), ("ُ", None), ("ِ", None),
        ("ّ", None), ("ْ", None),  # harakat
    ),
    phases=(
        Phase(
            tuple(
                R(lit, min_len=len(lit) + 3)
                for lit in (
                    "ەکانیان", "ەکانی", "ەکان", "ەکەی", "ەکە",
                    "کانی", "کان", "یەکی", "یەک", "ێکی", "ێک",
                )
            )
        ),
        Phase((R("ان", min_len=5), R("ەی", min_len=5), R("ی", min_len=5), R("ە", min_len=5))),
    ),
)

# --------------------------------------------------------------- brazilian
# Reference binds br → Lucene BrazilianAnalyzer (Language.scala:62), whose
# BrazilianStemmer is its own rule-based stemmer (RSLP family). Light
# ANALOG (documented): RSLP's adverb step (-mente), the plural step with
# the -ão/-al/-el/-ol/-m restorations, and theme-vowel deletion guarded by
# an -ão protect rule — the noun/verb suffix cascades and the exception
# lists are not replicated. Distinct from the Snowball Portuguese chain
# (snowball.py) exactly as the reference keeps pt and br distinct.
BRAZILIAN = Spec(
    name="brazilian",
    phases=(
        Phase((R("mente", min_len=8),)),
        Phase(
            (
                R("ões", min_len=6, replace="ão"),
                R("ães", min_len=6, replace="ão"),
                R("ais", min_len=6, replace="al"),
                R("éis", min_len=6, replace="el"),
                R("eis", min_len=6, replace="el"),
                R("óis", min_len=6, replace="ol"),
                R("ns", min_len=4, replace="m"),
                R("s", min_len=4),
            )
        ),
        Phase(
            # -ão protect: fires as a self-replace so the theme-vowel tier
            # cannot strip the o of a restored -ão
            (R("ão", min_len=4, replace="ão"),)
            + tuple(R(v, min_len=4) for v in ("a", "e", "o", "á", "é", "ó"))
        ),
    ),
)


_SPECS = {
    s.name: s
    for s in (
        LATVIAN, LITHUANIAN, ESTONIAN, GALICIAN, BASQUE, IRISH, POLISH,
        UKRAINIAN, SERBIAN, ARMENIAN, TAMIL, BENGALI, SORANI, BRAZILIAN,
    )
}

latvian_py = make_py(LATVIAN)
latvian_sql_ctes = make_sql_ctes(LATVIAN)
lithuanian_py = make_py(LITHUANIAN)
lithuanian_sql_ctes = make_sql_ctes(LITHUANIAN)
estonian_py = make_py(ESTONIAN)
estonian_sql_ctes = make_sql_ctes(ESTONIAN)
galician_py = make_py(GALICIAN)
galician_sql_ctes = make_sql_ctes(GALICIAN)
basque_py = make_py(BASQUE)
basque_sql_ctes = make_sql_ctes(BASQUE)
irish_py = make_py(IRISH)
irish_sql_ctes = make_sql_ctes(IRISH)
polish_py = make_py(POLISH)
polish_sql_ctes = make_sql_ctes(POLISH)
ukrainian_py = make_py(UKRAINIAN)
ukrainian_sql_ctes = make_sql_ctes(UKRAINIAN)
armenian_py = make_py(ARMENIAN)
armenian_sql_ctes = make_sql_ctes(ARMENIAN)
tamil_py = make_py(TAMIL)
tamil_sql_ctes = make_sql_ctes(TAMIL)
brazilian_py = make_py(BRAZILIAN)
brazilian_sql_ctes = make_sql_ctes(BRAZILIAN)


def _stops_ctes(spec: Spec):
    """SQL-generator wrapper for norm→stop→stem chains: same (src, out,
    prefix) signature plus the post-norm stop list at call time."""

    def ctes(src, out, p=None, stops=None):
        return make_sql_ctes(spec, stops=stops)(src, out, p)

    ctes.__name__ = f"{spec.name}_sql_ctes"
    return ctes


# norm-chain languages expose norm/phases separately (norm → stop → stem)
serbian_norm_py = make_norm_py(SERBIAN)
serbian_phases_py = make_phases_py(SERBIAN)
serbian_py = make_py(SERBIAN)
serbian_sql_ctes = _stops_ctes(SERBIAN)
bengali_norm_py = make_norm_py(BENGALI)
bengali_phases_py = make_phases_py(BENGALI)
bengali_py = make_py(BENGALI)
bengali_sql_ctes = _stops_ctes(BENGALI)
sorani_norm_py = make_norm_py(SORANI)
sorani_phases_py = make_phases_py(SORANI)
sorani_py = make_py(SORANI)
sorani_sql_ctes = _stops_ctes(SORANI)
