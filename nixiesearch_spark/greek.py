"""Greek stemmer — the Ntais (2006) rule cascade with the Saroukos
refinements, i.e. the algorithm behind Lucene's ``GreekStemmer`` that the
reference wraps for ``language: el`` (``config/mapping/Language.scala:69``,
GreekAnalyzer = GreekLowerCaseFilter + stop + GreekStemmer).

One spec, two executable forms, like ``snowball.py`` / ``light.py``:

- :func:`greek_py` — normalization + cascade, pure python (query-time
  analysis, oracle reference, and — memoized over Arrow batches — the
  index build path).
- :func:`greek_sql_ctes` — generated DuckDB SQL: one MATERIALIZED CTE per
  rule over exploded ``(doc_id, term)`` rows, emitted from the SAME rule
  tables below, so the correctness-gate oracle reproduces the stemmed
  field end-to-end in SQL.

The cascade operates on lowercase, final-sigma-normalized (ς→σ — the
unicode tokenizer already does this), ACCENT-FREE text; the accent fold
(ά→α … ΰ→υ, Lucene GreekLowerCaseFilter's monotonic diacritic removal) is
:func:`greek_norm_py` and runs before the stop filter, whose entries are
therefore stored post-normalization.

Rule inventory (22 numbered rules, length guards are on the length at
rule entry, exactly one pass):

- rule 0: irregular neuter nouns (κρεασ/περασ/τερασ/φωσ/καθεστωσ/γεγονοσ
  families and the -για nouns) — a longest-first map.
- rules 1-19: strip an inflectional suffix, conditionally restoring a
  derivational remainder when the remaining stem is in the rule's
  exception table (whole-word sets and/or endsWith lists, sometimes an
  ends-with-vowel test; rule 15 subtracts a second table).
- rule 20: -ματα/-ματων/-ματοσ → -μα.
- rule 21 ("long rule"): the big verb-ending map, applied only when rules
  0-20 left the word unchanged; ends with single-final-vowel removal.
- rule 22: comparative/superlative (-οτερ/-οτατ/… -εστερ/-εστατ), always.

Fidelity note: the rule STRUCTURE (order, guards, strip/restore shapes,
the rule-21 gating, the <4-char passthrough) follows the published
algorithm; the exception tables are reconstructed from the public
Ntais/Saroukos tables to the best of available sources in this sandbox
(no network) and are deterministic and self-consistent across both
executable forms — tests/test_greek.py asserts the two forms agree on
every rule path.
"""

from __future__ import annotations

# ------------------------------------------------------------------ spec

V = "αεηιουω"  # endsWithVowel
V2 = "αεηιοω"  # endsWithVowelNoY (υ excluded)

# accent fold (post-lower, monotonic): tonos, dialytika, dialytika+tonos
NORM_SRC = "άέήίόύώϊϋΐΰ"
NORM_DST = "αεηιουωιυιυ"
_NORM_TRANS = str.maketrans(NORM_SRC, NORM_DST)

# rule 0 — longest-first (suffix, strip_n, min_len_exclusive)
RULE0 = [
    ("καθεστωτοσ", 4, 9), ("καθεστωτων", 4, 9),
    ("γεγονοτοσ", 4, 8), ("γεγονοτων", 4, 8), ("καθεστωτα", 3, 8),
    ("τατογιου", 4, 7), ("τατογιων", 4, 7), ("γεγονοτα", 3, 7),
    ("καθεστωσ", 2, 7),
    ("σκαγιου", 4, 6), ("σκαγιων", 4, 6), ("ολογιου", 4, 6),
    ("ολογιων", 4, 6), ("κρεατοσ", 4, 6), ("κρεατων", 4, 6),
    ("περατοσ", 4, 6), ("περατων", 4, 6), ("τερατοσ", 4, 6),
    ("τερατων", 4, 6),
    ("τατογια", 3, 6), ("γεγονοσ", 2, 6),
    ("φαγιου", 4, 5), ("φαγιων", 4, 5), ("σογιου", 4, 5), ("σογιων", 4, 5),
    ("σκαγια", 3, 5), ("ολογια", 3, 5), ("κρεατα", 3, 5), ("περατα", 3, 5),
    ("τερατα", 3, 5),
    ("φαγια", 3, 4), ("σογια", 3, 4), ("φωτοσ", 3, 4), ("φωτων", 3, 4),
    ("κρεασ", 2, 4), ("περασ", 2, 4), ("τερασ", 2, 4),
    ("φωτα", 2, 3), ("φωσ", 1, 2),
]

# rules 1-9, 12-19: {"alts": [(suffix, minlen)], "pre": [...], "readd",
# "whole", "ends", "vowel", "neg"} — see _apply_strip below
EXC1_ENDS = ["οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι", "νταντ",
             "κυρ", "θει", "πεθερ"]
EXC2_ENDS = ["οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ"]
EXC3_ENDS = ["αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ",
             "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε"]
EXC4 = ["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"]
EXC6 = ["αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ",
        "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ",
        "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
        "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
        "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ"]
EXC7 = ["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ",
        "πικρ", "ποτ", "σιχ", "χ"]
EXC8 = ["τρ", "τσ", "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ",
        "καλπουζ", "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ",
        "μουσουλμ", "ν", "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ",
        "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ",
        "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ", "διπλ",
        "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ", "ικ", "καστ",
        "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ",
        "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ",
        "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
        "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ",
        "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
        "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
        "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ",
        "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ",
        "χαμηλοδαπ", "ψηλοταβ"]
EXC9 = ["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
        "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
        "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"]
EXC9_ENDS = ["οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
             "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
             "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
             "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ"]
EXC12A = ["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"]
EXC12B = ["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"]
EXC13 = ["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"]
EXC13_ENDS = ["σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"]
EXC14 = ["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ",
         "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ",
         "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ",
         "καθαρευ", "πλε", "τσα"]
EXC14_ENDS = ["ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
              "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ"]
EXC15A = ["αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
          "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν",
          "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ",
          "προσωποπ", "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ",
          "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν", "επιτ",
          "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
          "μ"]
EXC15A_ENDS = ["οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ",
               "λοχ", "σμην"]
EXC15B = ["ψοφ", "ναυλοχ"]
EXC15B_ENDS = ["κολλ"]
EXC16 = ["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"]
EXC17 = ["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
         "κοινοχρ", "παλιμψ"]
EXC18 = ["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"]
EXC19 = ["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"]

# strip-rules driven by _apply_strip / _strip_sql (shared spec)
STRIP_RULES = {
    1: {"alts": [("αδεσ", 4), ("αδων", 4)], "readd": "αδ",
        "ends": EXC1_ENDS, "neg": True},
    2: {"alts": [("εδεσ", 4), ("εδων", 4)], "readd": "εδ",
        "ends": EXC2_ENDS},
    3: {"alts": [("ουδεσ", 5), ("ουδων", 5)], "readd": "ουδ",
        "ends": EXC3_ENDS},
    4: {"alts": [("εωσ", 3), ("εων", 3)], "readd": "ε", "whole": EXC4},
    5: {"alts": [("ια", 2), ("ιου", 3), ("ιων", 3)], "readd": "ι",
        "vowel": V},
    6: {"alts": [("ικα", 3), ("ικο", 3), ("ικου", 4), ("ικων", 4)],
        "readd": "ικ", "whole": EXC6, "vowel": V},
    7: {"pre": [("ηθηκαμε", 7), ("ουσαμε", 6), ("αγαμε", 5),
                ("ησαμε", 5), ("ηκαμε", 5)],
        "alts": [("αμε", 3)], "readd": "αμ", "whole": EXC7},
    8: {"pre": [("ιουντανε", 8), ("ιοντανε", 7), ("ουντανε", 7),
                ("ηθηκανε", 7), ("ιοτανε", 6), ("οντανε", 6),
                ("ουσανε", 6), ("αγανε", 5), ("ησανε", 5), ("οτανε", 5),
                ("ηκανε", 5)],
        "alts": [("ανε", 3)], "readd": "αν", "whole": EXC8, "vowel": V2},
    9: {"pre": [("ησετε", 5)], "alts": [("ετε", 3)], "readd": "ετ",
        "whole": EXC9, "ends": EXC9_ENDS, "vowel": V2},
    12: None,  # two independent strips, see _rule12
    13: {"pre": [("ηθηκεσ", 6), ("ηθηκα", 5), ("ηθηκε", 5)],
         "alts": [("ηκεσ", 4), ("ηκα", 3), ("ηκε", 3)], "readd": "ηκ",
         "whole": EXC13, "ends": EXC13_ENDS},
    14: {"alts": [("ουσεσ", 5), ("ουσα", 4), ("ουσε", 4)],
         "readd": "ουσ", "whole": EXC14, "ends": EXC14_ENDS, "vowel": V},
    16: {"alts": [("ησου", 4), ("ησε", 3), ("ησα", 3)], "readd": "ησ",
         "whole": EXC16},
    17: {"alts": [("ηστε", 4)], "readd": "ηστ", "whole": EXC17},
    18: {"alts": [("ησουνε", 6), ("ηθουνε", 6), ("ουνε", 4)],
         "readd": "ουν", "whole": EXC18},
    19: {"alts": [("ησουμε", 6), ("ηθουμε", 6), ("ουμε", 4)],
         "readd": "ουμ", "whole": EXC19},
}

RULE20 = [("ματων", 3, 5), ("ματοσ", 3, 5), ("ματα", 2, 4)]

RULE21 = [
    ("ιοντουσαν", 9, 9),
    ("ιομασταν", 8, 8), ("ιοσασταν", 8, 8), ("ιουμαστε", 8, 8),
    ("οντουσαν", 8, 8),
    ("ιεμαστε", 7, 7), ("ιεσαστε", 7, 7), ("ιομουνα", 7, 7),
    ("ιοσαστε", 7, 7), ("ιοσουνα", 7, 7), ("ιουνται", 7, 7),
    ("ιουνταν", 7, 7), ("ηθηκατε", 7, 7), ("ομασταν", 7, 7),
    ("οσασταν", 7, 7), ("ουμαστε", 7, 7),
    ("ιομουν", 6, 6), ("ιονταν", 6, 6), ("ιοσουν", 6, 6),
    ("ηθειτε", 6, 6), ("ηθηκαν", 6, 6), ("ομουνα", 6, 6),
    ("οσαστε", 6, 6), ("οσουνα", 6, 6), ("ουνται", 6, 6),
    ("ουνταν", 6, 6), ("ουσαμε", 6, 6),
    ("ιεμαι", 5, 5), ("ιεται", 5, 5), ("ιεσαι", 5, 5), ("ιοταν", 5, 5),
    ("ηθεισ", 5, 5), ("ηθουν", 5, 5), ("ηκατε", 5, 5), ("ησατε", 5, 5),
    ("ησουν", 5, 5), ("ομουν", 5, 5), ("ονται", 5, 5), ("ονταν", 5, 5),
    ("οσουν", 5, 5), ("ουμαι", 5, 5), ("ουσαν", 5, 5),
    ("ειτε", 4, 4), ("ηθει", 4, 4), ("ηκαν", 4, 4), ("ησαν", 4, 4),
    ("ησει", 4, 4), ("ησεσ", 4, 4), ("ομαι", 4, 4), ("οταν", 4, 4),
    ("αει", 3, 3), ("εισ", 3, 3), ("ηθω", 3, 3), ("ησω", 3, 3),
    ("ουν", 3, 3), ("ουσ", 3, 3),
    ("αν", 2, 2), ("ασ", 2, 2), ("αω", 2, 2), ("ει", 2, 2),
    ("εσ", 2, 2), ("ησ", 2, 2), ("οι", 2, 2), ("οσ", 2, 2),
    ("ου", 2, 2), ("υσ", 2, 2), ("ων", 2, 2),
] + [(v, 1, 1) for v in V]

RULE22 = [
    ("εστερ", 5, 5), ("εστατ", 5, 5),
    ("οτερ", 4, 4), ("οτατ", 4, 4), ("υτερ", 4, 4), ("υτατ", 4, 4),
    ("ωτερ", 4, 4), ("ωτατ", 4, 4),
]


# ------------------------------------------------------------ python form

def greek_norm_py(w: str) -> str:
    """Accent fold (GreekLowerCaseFilter analog); input is already
    lowercase + ς→σ from the unicode tokenizer."""
    return w.translate(_NORM_TRANS)


def _map_rule(w: str, table) -> str:
    for suf, strip, minlen in table:
        if len(w) > minlen and w.endswith(suf):
            return w[:-strip]
    return w


def _cond(base: str, spec) -> bool:
    if spec.get("whole") and base in spec["whole"]:
        return True
    if spec.get("ends") and any(base.endswith(e) for e in spec["ends"]):
        return True
    v = spec.get("vowel")
    if v and base and base[-1] in v:
        return True
    return False


def _apply_strip(w: str, spec) -> str:
    for suf, minlen in spec.get("pre", ()):
        if len(w) > minlen and w.endswith(suf):
            w = w[: -len(suf)]
            break
    for suf, minlen in spec["alts"]:
        if len(w) > minlen and w.endswith(suf):
            base = w[: -len(suf)]
            hit = _cond(base, spec)
            if spec.get("neg"):
                hit = not hit
            return base + spec["readd"] if hit else base
    return w


def _rule7(w: str) -> str:
    # special: the bare word αγαμε keeps its stem αγαμ
    if w == "αγαμε":
        return "αγαμ"
    return _apply_strip(w, STRIP_RULES[7])


def _rule10(w: str) -> str:
    if len(w) > 5 and (w.endswith("οντασ") or w.endswith("ωντασ")):
        base = w[:-5]
        if base == "αρχ":
            return "αρχοντ"
        if base.endswith("κρε"):
            return base + "ωντ"
        return base
    return w


def _rule11(w: str) -> str:
    if len(w) > 6 and w.endswith("ομαστε"):
        base = w[:-6]
        return "ονομαστ" if base == "ον" else base
    if len(w) > 7 and w.endswith("ιομαστε"):
        base = w[:-7]
        return "ονομαστ" if base == "ον" else base
    return w


def _rule12(w: str) -> str:
    if len(w) > 5 and w.endswith("ιεστε"):
        base = w[:-5]
        return base + "ιεστ" if base in EXC12A else base
    if len(w) > 4 and w.endswith("εστε"):
        base = w[:-4]
        return base + "εστ" if base in EXC12B else base
    return w


def _rule15(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        base, removed = w[:-4], True
    elif len(w) > 3 and (w.endswith("αγα") or w.endswith("αγε")):
        base, removed = w[:-3], True
    if not removed:
        return w
    cond1 = base in EXC15A or any(base.endswith(e) for e in EXC15A_ENDS)
    cond2 = base in EXC15B or any(base.endswith(e) for e in EXC15B_ENDS)
    return base + "αγ" if (cond1 and not cond2) else base


def greek_stem_py(w: str) -> str:
    """The 22-rule cascade over a normalized token (see module doc)."""
    if len(w) < 4:
        return w
    orig = len(w)
    w = _map_rule(w, RULE0)
    for i in (1, 2, 3, 4, 5, 6):
        w = _apply_strip(w, STRIP_RULES[i])
    w = _rule7(w)
    w = _apply_strip(w, STRIP_RULES[8])
    w = _apply_strip(w, STRIP_RULES[9])
    w = _rule10(w)
    w = _rule11(w)
    w = _rule12(w)
    w = _apply_strip(w, STRIP_RULES[13])
    w = _apply_strip(w, STRIP_RULES[14])
    w = _rule15(w)
    for i in (16, 17, 18, 19):
        w = _apply_strip(w, STRIP_RULES[i])
    w = _map_rule(w, RULE20)
    if len(w) == orig:
        w = _map_rule(w, RULE21)
    return _map_rule(w, RULE22)


def greek_py(word: str) -> str:
    """normalize + stem — the per-token function the analyzer chain uses
    AFTER the stop filter (stop entries are stored post-normalization)."""
    return greek_stem_py(greek_norm_py(word))


# --------------------------------------------------------------- SQL form

def _q(s: str) -> str:
    return "'" + s + "'"


def _chop(x: str, n: int) -> str:
    return f"substr({x}, 1, length({x}) - {n})"


def _ends(x: str, suf: str) -> str:
    return f"ends_with({x}, {_q(suf)})"


def _map_sql(x: str, table) -> str:
    whens = "\n    ".join(
        f"WHEN length({x}) > {ml} AND {_ends(x, suf)} THEN {_chop(x, strip)}"
        for suf, strip, ml in table
    )
    return f"CASE\n    {whens}\n    ELSE {x} END"


def _cond_sql(base: str, spec) -> str:
    parts = []
    if spec.get("whole"):
        lst = "[" + ",".join(_q(w) for w in spec["whole"]) + "]"
        parts.append(f"list_contains({lst}, {base})")
    if spec.get("ends"):
        parts.extend(_ends(base, e) for e in spec["ends"])
    if spec.get("vowel"):
        chars = ",".join(_q(c) for c in spec["vowel"])
        parts.append(f"substr({base}, length({base}), 1) IN ({chars})")
    cond = "(" + " OR ".join(parts) + ")"
    return f"NOT {cond}" if spec.get("neg") else cond


def _pre_sql(x: str, pre) -> str:
    whens = "\n    ".join(
        f"WHEN length({x}) > {ml} AND {_ends(x, suf)} THEN {_chop(x, len(suf))}"
        for suf, ml in pre
    )
    return f"CASE\n    {whens}\n    ELSE {x} END"


def _alts_sql(x: str, spec) -> str:
    whens = []
    for suf, ml in spec["alts"]:
        base = _chop(x, len(suf))
        whens.append(
            f"WHEN length({x}) > {ml} AND {_ends(x, suf)} THEN "
            f"CASE WHEN {_cond_sql(base, spec)} "
            f"THEN {base} || {_q(spec['readd'])} ELSE {base} END"
        )
    joined = "\n    ".join(whens)
    return f"CASE\n    {joined}\n    ELSE {x} END"


def _rule10_sql(x: str) -> str:
    b = _chop(x, 5)
    return f"""CASE
    WHEN length({x}) > 5 AND ({_ends(x, 'οντασ')} OR {_ends(x, 'ωντασ')}) THEN
      CASE WHEN {b} = 'αρχ' THEN 'αρχοντ'
           WHEN {_ends(b, 'κρε')} THEN {b} || 'ωντ'
           ELSE {b} END
    ELSE {x} END"""


def _rule11_sql(x: str) -> str:
    b6, b7 = _chop(x, 6), _chop(x, 7)
    return f"""CASE
    WHEN length({x}) > 6 AND {_ends(x, 'ομαστε')} THEN
      CASE WHEN {b6} = 'ον' THEN 'ονομαστ' ELSE {b6} END
    WHEN length({x}) > 7 AND {_ends(x, 'ιομαστε')} THEN
      CASE WHEN {b7} = 'ον' THEN 'ονομαστ' ELSE {b7} END
    ELSE {x} END"""


def _rule12_sql(x: str) -> str:
    b5, b4 = _chop(x, 5), _chop(x, 4)
    la = "[" + ",".join(_q(w) for w in EXC12A) + "]"
    lb = "[" + ",".join(_q(w) for w in EXC12B) + "]"
    return f"""CASE
    WHEN length({x}) > 5 AND {_ends(x, 'ιεστε')} THEN
      CASE WHEN list_contains({la}, {b5}) THEN {b5} || 'ιεστ' ELSE {b5} END
    WHEN length({x}) > 4 AND {_ends(x, 'εστε')} THEN
      CASE WHEN list_contains({lb}, {b4}) THEN {b4} || 'εστ' ELSE {b4} END
    ELSE {x} END"""


def _rule15_sql(x: str) -> str:
    la = "[" + ",".join(_q(w) for w in EXC15A) + "]"
    lb = "[" + ",".join(_q(w) for w in EXC15B) + "]"

    def branch(b: str) -> str:
        c1 = "(" + " OR ".join(
            [f"list_contains({la}, {b})"] + [_ends(b, e) for e in EXC15A_ENDS]
        ) + ")"
        c2 = "(" + " OR ".join(
            [f"list_contains({lb}, {b})"] + [_ends(b, e) for e in EXC15B_ENDS]
        ) + ")"
        return f"CASE WHEN {c1} AND NOT {c2} THEN {b} || 'αγ' ELSE {b} END"

    return f"""CASE
    WHEN length({x}) > 4 AND {_ends(x, 'αγεσ')} THEN {branch(_chop(x, 4))}
    WHEN length({x}) > 3 AND ({_ends(x, 'αγα')} OR {_ends(x, 'αγε')}) THEN {branch(_chop(x, 3))}
    ELSE {x} END"""


def greek_sql_ctes(src: str, out: str, p: str = "el_",
                   stops: list[str] | None = None) -> str:
    """MATERIALIZED CTE chain: ``src(doc_id, term)`` → norm → stop →
    22-rule cascade → ``out(doc_id, term)``. One CTE per rule so DuckDB
    never inlines the cascade into an exponential expression tree (the
    snowball.py lesson)."""
    norm = f"translate(term, {_q(NORM_SRC)}, {_q(NORM_DST)})"
    if stops is not None:
        lst = "[" + ",".join(_q(w) for w in stops) + "]"
        head = (
            f"SELECT doc_id, t0 FROM (SELECT doc_id, {norm} AS t0 FROM {src}) nq "
            f"WHERE NOT list_contains({lst}, t0)"
        )
    else:
        head = f"SELECT doc_id, {norm} AS t0 FROM {src}"

    def _no_pre(i: int) -> dict:
        spec = dict(STRIP_RULES[i])
        spec.pop("pre")
        return spec

    # (stage name, fn(input column) -> expression) in cascade order;
    # pre-strip halves of rules 7/8/9/13 are their own stages
    stages = [("r0", lambda x: _map_sql(x, RULE0))]
    for i in (1, 2, 3, 4, 5, 6):
        stages.append((f"r{i}", lambda x, i=i: _alts_sql(x, STRIP_RULES[i])))
    stages.append(("r7a", lambda x: _pre_sql(x, STRIP_RULES[7]["pre"])))
    stages.append((
        "r7",
        lambda x: (
            f"CASE WHEN {x} = 'αγαμε' THEN 'αγαμ' "
            f"ELSE ({_alts_sql(x, _no_pre(7))}) END"
        ),
    ))
    for i in (8, 9):
        stages.append((f"r{i}a", lambda x, i=i: _pre_sql(x, STRIP_RULES[i]["pre"])))
        stages.append((f"r{i}", lambda x, i=i: _alts_sql(x, _no_pre(i))))
    stages.append(("r10", _rule10_sql))
    stages.append(("r11", _rule11_sql))
    stages.append(("r12", _rule12_sql))
    stages.append(("r13a", lambda x: _pre_sql(x, STRIP_RULES[13]["pre"])))
    stages.append(("r13", lambda x: _alts_sql(x, _no_pre(13))))
    stages.append(("r14", lambda x: _alts_sql(x, STRIP_RULES[14])))
    stages.append(("r15", _rule15_sql))
    for i in (16, 17, 18, 19):
        stages.append((f"r{i}", lambda x, i=i: _alts_sql(x, STRIP_RULES[i])))
    stages.append(("r20", lambda x: _map_sql(x, RULE20)))
    stages.append((
        "r21",
        lambda x: (
            f"CASE WHEN length({x}) = length(t0) THEN ({_map_sql(x, RULE21)}) "
            f"ELSE {x} END"
        ),
    ))
    stages.append(("r22", lambda x: _map_sql(x, RULE22)))

    ctes = [f"{p}n AS MATERIALIZED (\n  {head}\n)"]
    prev, col = f"{p}n", "t0"
    for name, fn in stages:
        ctes.append(
            f"{p}{name} AS MATERIALIZED (\n"
            f"  SELECT doc_id, t0, {fn(col)} AS t FROM {prev}\n)"
        )
        prev, col = f"{p}{name}", "t"
    # words under 4 chars bypass the cascade entirely (stem() entry guard)
    ctes.append(
        f"{out} AS MATERIALIZED (\n"
        f"  SELECT doc_id, CASE WHEN length(t0) < 4 THEN t0 ELSE t END AS term\n"
        f"  FROM {prev}\n)"
    )
    return ",\n".join(ctes) + ","
