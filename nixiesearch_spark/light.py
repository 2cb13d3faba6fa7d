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
