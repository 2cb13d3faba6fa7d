"""Analysis chain: ONE tokenizer spec shared by index build, query compile,
and the pure-Python oracle.

The reference uses Lucene's default ``StandardAnalyzer`` for every text field
unless a language is configured (reference ``config/mapping/Language.scala:52-99``,
default at 96-99), and the SAME analyzer instance at index time and query time
(reference ``index/Indexer.scala:207``, ``api/query/retrieve/MatchQuery.scala:43-49``).
We pin a deterministic ASCII-equivalent of StandardAnalyzer for the
source-code / synthetic corpora in scope:

- truncate field value at 32000 chars BEFORE analysis
  (reference ``core/field/TextFieldCodec.scala:66-69,147`` MAX_FIELD_SEARCH_SIZE)
- lowercase
- split on runs of non-word chars ``[^0-9A-Za-z_]+`` (UAX#29 keeps ``_`` as
  word-internal ExtendNumLet, so ``foo_bar`` is one token — same here)
- drop empty tokens and tokens longer than 255 chars
  (StandardAnalyzer ``maxTokenLength`` default 255)

Three implementations, guaranteed identical by tests/test_analysis.py:

1. :func:`tokenize_col` — pure Catalyst (JVM, whole-stage codegen). This is
   the default build path: ``split`` + ``filter`` + ``transform`` are
   vectorized JVM expressions, strictly faster than any Python UDF. (The
   north rule's "vectorized Arrow UDF, no per-row Python" floor is exceeded:
   zero Python in the hot path.)
2. :func:`tokenize_arrow_batches` — Arrow ``mapInArrow``-compatible batch
   tokenizer used by the packed-posting build where tokenization, norm
   computation and per-doc stats happen in one Arrow pass.
3. :func:`tokenize_py` — reference implementation for the numpy oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_FIELD_SEARCH_SIZE = 32000  # chars, reference TextFieldCodec.scala:147
MAX_TOKEN_LENGTH = 255  # StandardAnalyzer default
TOKEN_SPLIT_REGEX = "[^0-9A-Za-z_]+"
# JVM spelling: Java's \W is exactly [^0-9A-Za-z_] (ASCII classes by
# default) but compiles to a fast CharProperty — 19x faster than the
# explicit character class in whole-stage codegen. Python's \W is
# Unicode-aware, so the oracle keeps the explicit class; both treat every
# non-ASCII character as a delimiter, so semantics are identical.
TOKEN_SPLIT_REGEX_JVM = r"\W+"
# DuckDB (RE2) spelling of the same split — used by __spark_entry__ oracle SQL
TOKEN_SPLIT_REGEX_RE2 = "[^0-9A-Za-z_]+"

_SPLIT_RE = re.compile(TOKEN_SPLIT_REGEX)

# Unicode-Latin tokenizer spec used by the language analyzers (german/french):
# word chars = ASCII word chars + Latin-1 Supplement / Latin Extended-A/B
# letters (U+00C0–U+024F minus × U+00D7 and ÷ U+00F7). An EXPLICIT literal
# class — not \w with engine flags — so Java regex (Spark), Python re and
# RE2 (DuckDB) are identical by construction; all three lower() agree on
# these ranges. This upgrades the reference's per-language Lucene analyzers
# from the ASCII-pinned approximation: German "für"/French "été" survive as
# single tokens instead of fragmenting.
TOKEN_SPLIT_LATIN = "[^0-9A-Za-z_À-ÖØ-öø-ɏ]+"
_SPLIT_LATIN_RE = re.compile(TOKEN_SPLIT_LATIN)

# Unicode tokenizer class: Latin (as above) + Greek + Cyrillic LETTERS
# ONLY — monotonic Greek listed explicitly (Greek punctuation inside
# U+0370–03FF — ·, the erotimatiko — stays a delimiter), the polytonic
# block as letter sub-ranges (its standalone accent marks U+1FBD–1FC1,
# 1FCD–1FCF, 1FDD–1FDF, 1FED–1FEF, 1FFD–1FFE are delimiters), and
# Cyrillic minus the signs/combining marks U+0482–0489. Still an EXPLICIT
# literal class:
# Java regex (Spark), Python re and RE2 (DuckDB) treat code-point ranges
# over literals identically. Case folding: Python str.lower and DuckDB's
# utf8proc apply the CONTEXTUAL final-sigma rule (ΑΣ→ας) while Spark's
# UTF8String uses the simple per-code-point mapping (ΑΣ→ασ) — AND written
# Greek itself ends words in ς, so "τέλος" and "ΤΕΛΟΣ" would lower to
# different tokens regardless. All three forms therefore normalize ς→σ
# after lowercasing — exactly what Lucene's GreekLowerCaseFilter does —
# which makes the engines identical AND canonicalizes the σ/ς pair. This is
# the UAX#29-equivalent upgrade path for the reference's default
# StandardAnalyzer (Language.scala:57): Greek/Cyrillic text survives the
# standard_unicode / russian / greek analyzers as real tokens.
TOKEN_SPLIT_UNICODE = (
    "[^0-9A-Za-z_À-ÖØ-öø-ɏ"
    "Α-ΡΣ-Ωα-ωάέήίόύώΐΰϊϋΆΈΉΊΌΎΏ"
    # polytonic Greek letter sub-ranges (U+1F00–1FFC minus marks and gaps)
    "ἀ-ἕἘ-Ἕἠ-ὅὈ-Ὅὐ-ὗ"
    "ὙὛὝὟ-ώᾀ-ᾴᾶ-ᾼι"
    "ῂ-ῄῆ-ῌῐ-ΐῖ-Ίῠ-Ῥ"
    "ῲ-ῴῶ-ῼ"
    # Cyrillic letters (skip U+0482 thousands sign + U+0483–0489 combining)
    "Ѐ-ҁҊ-ӿԀ-ԯ"
    # Arabic: hamza..yeh letters + tatweel + the harakat/tanween combining
    # marks (U+0621–U+0652 contiguous) — diacritics are WORD chars so
    # vocalized words stay whole (the arabic analyzer's normalizer strips
    # them); the hamza-above mark U+0654 and the Persian/Urdu letters
    # پ چ ژ گ ک ی ۀ ہ ے (all folded by the persian normalizer) are word
    # chars too, so the folds are reachable
    "ء-ْٔپچژگکیۀہے"
    # Sorani Kurdish letters (reh/veh/lam with ring, waw/yeh with small v,
    # ae) — word chars so the ckb normalizer/stemmer can reach them
    "ڕڤڵۆێە"
    # Devanagari signs/letters/matras/virama (U+0901–U+0963); the danda
    # punctuation U+0964/0965 and digits stay delimiters
    "ँ-ॣ"
    # Armenian letters (upper + lower incl. the ech-yiwn ligature և);
    # the Armenian punctuation U+0559–055F stays a delimiter
    "Ա-Ֆա-և"
    # Bengali signs/letters/matras/virama + the nukta-composed letters
    # (U+0981–09E3 letter sub-ranges); danda and Bengali digits stay
    # delimiters
    "ঁ-ঃঅ-ঌএঐও-নপ-রলশ-হ়-ৄেৈো-ৎৗড়-ৣ"
    # Tamil letter/sign sub-ranges (U+0B82–0BD7); digits and fraction
    # signs stay delimiters
    "ஂஃஅ-ஊஎ-ஐஒ-கங-சஜஞ-டண-தந-பம-ஹா-ூெ-ைொ-்ௗ]+"
)
_SPLIT_UNICODE_RE = re.compile(TOKEN_SPLIT_UNICODE)


def tokenize_unicode_py(text: str | None) -> list[str]:
    """Unicode tokenizer (python form) — must match the Catalyst form and
    the DuckDB RE2 spelling (tests/test_analysis_unicode.py)."""
    if text is None:
        return []
    low = text[:MAX_FIELD_SEARCH_SIZE].lower().replace("ς", "σ")
    toks = _SPLIT_UNICODE_RE.split(low)
    return [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]


def tokenize_unicode_col(col: Column) -> Column:
    """Catalyst form of the unicode tokenizer — pure JVM, the same literal
    class (no \\w flags: engine-specific word classes would break the
    three-way identity)."""
    low = F.translate(
        F.lower(F.substring(col, 1, MAX_FIELD_SEARCH_SIZE)), "ς", "σ"
    )
    toks = F.split(low, TOKEN_SPLIT_UNICODE)
    return F.filter(toks, lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LENGTH))


def tokenize_latin_py(text: str | None) -> list[str]:
    """Unicode-Latin tokenizer (python form; the language-analyzer chains are
    pandas_udf-backed, so this IS the build/query path implementation)."""
    if text is None:
        return []
    toks = _SPLIT_LATIN_RE.split(text[:MAX_FIELD_SEARCH_SIZE].lower())
    return [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]


# --------------------------------------------------------------- CJK bigram
# Lucene CJKAnalyzer analog (reference maps zh/ja/ko to it,
# config/mapping/Language.scala:64,94,96): StandardTokenizer +
# CJKWidthFilter + LowerCaseFilter + CJKBigramFilter + StopFilter.
# CJKBigramFilter buffers the CHARACTERS of consecutive CJK-typed tokens
# and emits overlapping character bigrams over that buffer (a lone CJK
# char with no CJK neighbour is emitted as a unigram), so the net effect
# is: maximal runs of CJK codepoints → char bigrams, crossing Han/kana
# sub-script boundaries. Non-CJK text tokenizes like the Latin class.
#
# Documented simplifications vs Lucene (both one-way narrowings, stated
# here so the spec is the contract): (1) CJKWidthFilter is implemented as
# the fullwidth-ASCII fold only (U+FF01–FF5E → U+0021–007E); halfwidth
# katakana (U+FF66–FF9F) would need voiced-mark composition (ｶ+ﾞ → ガ) and
# is left out — those codepoints are delimiters. (2) The Han class is the
# URO + extension A (U+4E00–9FFF, U+3400–4DBF); compatibility ideographs
# are delimiters. The English-style stop set (CJKAnalyzer's default) runs
# AFTER bigramming, matching Lucene's filter order.
_CJK_CLASS = (
    "㐀-䶿一-鿿"  # Han: ext A + URO
    "ぁ-ゖゝゞ"  # Hiragana + iteration marks
    "ァ-ヺー-ヾ"  # Katakana + prolonged sound/iteration
    "가-힣"  # Hangul syllables
)
# fullwidth ASCII fold (CJKWidthFilter's main mapping): ！-～ → !-~
_CJK_FW = "".join(chr(0xFF01 + i) for i in range(94))
_CJK_HW = "".join(chr(0x21 + i) for i in range(94))
_CJK_FW_TRANS = str.maketrans(_CJK_FW, _CJK_HW)
TOKEN_SPLIT_CJK = "[^0-9A-Za-z_À-ÖØ-öø-ɏ" + _CJK_CLASS + "]+"

# Thai letter/sign run class (U+0E01–0E3A consonants + vowel signs,
# U+0E40–0E4E leading vowels, ๆ, tone marks; ฿ and the Thai digits stay
# delimiters). Used by the Thai run-bigram analyzer below.
_THAI_CLASS = "ก-ฺเ-๎"
TOKEN_SPLIT_THAI = "[^0-9A-Za-z_À-ÖØ-öø-ɏ" + _THAI_CLASS + "]+"


def _make_bigram_forms(cls: str, split_class: str, fw: str = "", hw: str = ""):
    """Run-bigram tokenizer family, three rule-identical forms from one
    spec: maximal runs of ``cls`` codepoints become overlapping character
    bigrams (a lone char stays a unigram), everything else tokenizes like
    the Latin class. Optional ``fw``→``hw`` translate runs before lower
    (CJKWidthFilter's fullwidth fold). Returns (py, col, sql_fn)."""
    run_re = re.compile("([" + cls + "]+)")
    split_re = re.compile(split_class)
    head_re = re.compile("^[" + cls + "]")
    trans = str.maketrans(fw, hw) if fw else None

    def tok_py(text: str | None) -> list[str]:
        if text is None:
            return []
        low = text[:MAX_FIELD_SEARCH_SIZE]
        if trans:
            low = low.translate(trans)
        low = low.lower()
        out: list[str] = []
        for tok in split_re.split(run_re.sub(r" \1 ", low)):
            if not tok or len(tok) > MAX_TOKEN_LENGTH:
                continue
            if len(tok) > 1 and head_re.match(tok):
                out.extend(tok[i : i + 2] for i in range(len(tok) - 1))
            else:
                out.append(tok)
        return out

    def tok_col(col: Column) -> Column:
        """Catalyst form — pure JVM: (translate +) regexp pad + split +
        nested higher-order bigram expansion. No UDF in the chain."""
        base = F.substring(col, 1, MAX_FIELD_SEARCH_SIZE)
        if fw:
            base = F.translate(base, fw, hw)
        low = F.lower(base)
        padded = F.regexp_replace(low, "([" + cls + "]+)", " $1 ")
        toks = F.filter(
            F.split(padded, split_class),
            lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LENGTH),
        )
        expanded = F.transform(
            toks,
            lambda t: F.when(
                (F.length(t) > 1) & t.rlike("^[" + cls + "]"),
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 1),
                    lambda i: F.substr(t, i, F.lit(2)),
                ),
            ).otherwise(F.array(t)),
        )
        return F.flatten(expanded)

    def tok_sql(src_text: str, src: str = "src") -> str:
        """DuckDB spelling: SELECT fragment producing (doc_id, term) from
        ``{src}`` rows (doc_id, {src_text}). Same (fold +) pad
        (regexp_replace 'g'), split class and bigram expansion (lateral
        generate_series) as the other two forms."""
        inner = f"substr({src_text},1,{MAX_FIELD_SEARCH_SIZE})"
        if fw:
            hw_sql = hw.replace("'", "''")  # ASCII ' is in the fold target
            inner = f"translate({inner}, '{fw}', '{hw_sql}')"
        return f"""
  SELECT doc_id,
         CASE WHEN length(term) > 1 AND regexp_matches(term, '^[{cls}]')
              THEN substr(term, g.i, 2) ELSE term END AS term
  FROM (
    SELECT doc_id, x.term
    FROM {src}, unnest(list_filter(
      regexp_split_to_array(
        regexp_replace(lower({inner}),
                       '([{cls}]+)', ' \\1 ', 'g'),
        '{split_class}'),
      x -> x <> '' AND length(x) <= {MAX_TOKEN_LENGTH})) AS x(term)
  ) tokw,
  unnest(generate_series(1,
    CASE WHEN length(term) > 1 AND regexp_matches(term, '^[{cls}]')
         THEN length(term) - 1 ELSE 1 END)) AS g(i)
"""

    return tok_py, tok_col, tok_sql


# CJK bigram tokenizer (must match across the three forms —
# tests/test_analysis_cjk.py) and its Thai sibling. ThaiAnalyzer's real
# tokenizer is a DICTIONARY BreakIterator (no ICU in this sandbox —
# PARITY.md deferral); character bigrams over Thai runs are the documented
# segmentation-free analog (a standard Thai IR baseline), same machinery
# as the CJK chain minus the width fold.
tokenize_cjk_py, tokenize_cjk_col, cjk_tok_sql = _make_bigram_forms(
    _CJK_CLASS, TOKEN_SPLIT_CJK, _CJK_FW, _CJK_HW
)
tokenize_thai_py, tokenize_thai_col, thai_tok_sql = _make_bigram_forms(
    _THAI_CLASS, TOKEN_SPLIT_THAI
)


# Catalan tokenizer class: the Latin class plus U+00B7 (middle dot) as a
# WORD char — UAX#29 classes it MidLetter, so Lucene's StandardTokenizer
# keeps "col·legi" (ela geminada l·l) one token; the Snowball stemmer's
# clean step then maps '·' → '.'. Apostrophes stay DELIMITERS: "l'índex"
# splits into "l" + "índex", and the elided articles d/l/m/n/s/t sit in the
# Catalan stopword list — the same net effect as Lucene CatalanAnalyzer's
# ElisionFilter (article dropped, host word kept).
TOKEN_SPLIT_CATALAN = "[^0-9A-Za-z_À-ÖØ-öø-ɏ·]+"
_SPLIT_CATALAN_RE = re.compile(TOKEN_SPLIT_CATALAN)


def tokenize_catalan_py(text: str | None) -> list[str]:
    if text is None:
        return []
    toks = _SPLIT_CATALAN_RE.split(text[:MAX_FIELD_SEARCH_SIZE].lower())
    return [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]


# Turkish tokenizer: Lucene TurkishAnalyzer's tokenizer-side filters —
# ApostropheFilter (drop the apostrophe AND everything after it:
# Türkiye'nin → Türkiye) and TurkishLowerCaseFilter's dotted/dotless-i
# rule (İ→i, I→ı) applied BEFORE generic lower() — python str.lower,
# DuckDB utf8proc and Java all expand İ to "i̇" (i + combining dot) under
# the full Unicode mapping, so the translate must run first in all three
# forms or the combining dot would fragment the token. A pre-existing
# combining dot U+0307 in the input stays a delimiter (Lucene folds it;
# documented narrowing).
_TR_CASE_SRC = "İI"
_TR_CASE_DST = "iı"
_TR_CASE_TRANS = str.maketrans(_TR_CASE_SRC, _TR_CASE_DST)
_TR_APOS = "['’][0-9A-Za-z_À-ÖØ-öø-ɏ]*"
_TR_APOS_RE = re.compile(_TR_APOS)


def tokenize_turkish_py(text: str | None) -> list[str]:
    if text is None:
        return []
    s = text[:MAX_FIELD_SEARCH_SIZE].translate(_TR_CASE_TRANS)
    s = _TR_APOS_RE.sub("", s).lower()
    toks = _SPLIT_LATIN_RE.split(s)
    return [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]


def turkish_tok_sql(src_text: str, src: str = "src") -> str:
    """DuckDB spelling of the Turkish tokenizer: SELECT fragment producing
    (doc_id, term) from ``{src}`` rows. Same translate-first order."""
    _TR_APOS_SQL = _TR_APOS.replace("'", "''")  # the literal ' in the class
    return f"""
  SELECT doc_id, x.term
  FROM {src}, unnest(list_filter(
    regexp_split_to_array(
      lower(regexp_replace(translate(substr({src_text},1,{MAX_FIELD_SEARCH_SIZE}),
                                     '{_TR_CASE_SRC}', '{_TR_CASE_DST}'),
                           '{_TR_APOS_SQL}', '', 'g')),
      '{TOKEN_SPLIT_LATIN}'),
    x -> x <> '' AND length(x) <= {MAX_TOKEN_LENGTH})) AS x(term)
"""


def tokenize_py(text: str | None) -> list[str]:
    """Oracle tokenizer (single string). Must match :func:`tokenize_col`."""
    if text is None:
        return []
    toks = _SPLIT_RE.split(text[:MAX_FIELD_SEARCH_SIZE].lower())
    return [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]


def tokenize_col(col: Column) -> Column:
    """Catalyst tokenizer: returns array<string> of analyzed tokens.

    Entirely JVM-side (split/filter are codegen'd), so the 100 TB build path
    never crosses the Python boundary for tokenization.
    """
    toks = F.split(F.lower(F.substring(col, 1, MAX_FIELD_SEARCH_SIZE)), TOKEN_SPLIT_REGEX_JVM)
    return F.filter(toks, lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LENGTH))


# ---------------------------------------------------------------------------
# Analyzer registry — the engine's analog of the reference's per-field
# analyzer selection (``config/mapping/Language.scala:52-99`` picks a stock
# Lucene analyzer per language; default StandardAnalyzer; composed per index
# via PerFieldAnalyzerWrapper with KeywordAnalyzer base,
# ``config/mapping/PerFieldAnalyzer.scala``). One registry entry = a pair of
# (Catalyst Column fn, pure-Python fn) guaranteed equivalent; index build and
# query analysis always use the field's configured analyzer.


def _whitespace_col(col: Column) -> Column:
    toks = F.split(F.lower(F.substring(col, 1, MAX_FIELD_SEARCH_SIZE)), r"\s+")
    return F.filter(toks, lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LENGTH))


def _whitespace_py(text: str | None) -> list[str]:
    if text is None:
        return []
    toks = re.split(r"\s+", text[:MAX_FIELD_SEARCH_SIZE].lower())
    return [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH]


def _keyword_col(col: Column) -> Column:
    # KeywordAnalyzer: the whole value is one token, untokenized, case kept
    return F.when(
        col.isNotNull() & (F.length(col) > 0), F.array(F.substring(col, 1, MAX_FIELD_SEARCH_SIZE))
    ).otherwise(F.array().cast("array<string>"))


def _keyword_py(text: str | None) -> list[str]:
    if not text:
        return []
    return [text[:MAX_FIELD_SEARCH_SIZE]]


# Stopword chains for the most common language analyzers the reference
# exposes (Language.scala; Lucene's per-language stop sets — abbreviated
# public snowball-style lists; the default StandardAnalyzer keeps
# stopwords OFF, matching the reference default). Extension point for the
# remaining languages: add a list here.
#
# english/spanish run over the ASCII-pinned standard tokenizer (entries must
# be ASCII); german/french run over the Unicode-Latin tokenizer, so accented
# entries (für, été) are real tokens and belong in the lists.
LANG_STOPWORDS = {
    "english": [
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with",
    ],
    "german": [
        "der", "die", "das", "und", "oder", "aber", "ist", "ein", "eine",
        "nicht", "mit", "von", "zu", "im", "auf", "den", "dem", "des",
        "für", "über", "während", "würde", "daß", "dass", "als", "auch",
        "an", "werden", "aus", "er", "es", "sie", "wir", "war", "wird",
    ],
    "french": [
        "le", "la", "les", "et", "ou", "mais", "est", "un", "une", "pas",
        "avec", "de", "du", "des", "au", "aux", "pour", "dans", "sur",
        "à", "été", "être", "cette", "ces", "ce", "il", "elle", "ne", "se",
        "son", "sa", "ses", "qui", "que", "plus", "par", "sont", "ont",
    ],
    "spanish": [
        "el", "la", "los", "las", "y", "o", "pero", "es", "un", "una", "no",
        "con", "de", "del", "al", "para", "en", "por", "que", "él", "más",
        "también", "está", "sí", "como", "se", "su", "sus", "le", "lo",
    ],
    "italian": [
        "di", "a", "da", "in", "con", "su", "per", "tra", "fra", "il",
        "lo", "la", "i", "gli", "le", "un", "uno", "una", "e", "o", "ma",
        "se", "che", "chi", "cui", "non", "come", "dove", "più", "anche",
        "è", "sono", "del", "della", "dei", "delle", "al", "nel", "questo",
    ],
    "portuguese": [
        "o", "a", "os", "as", "um", "uma", "uns", "umas", "e", "ou",
        "mas", "de", "do", "da", "dos", "das", "em", "no", "na", "nos",
        "nas", "por", "para", "com", "sem", "que", "se", "não", "é",
        "são", "ao", "aos", "à", "às", "seu", "sua", "este", "esta",
        "isso", "ele", "ela", "eles", "elas", "como", "mais", "foi",
    ],
    "dutch": [
        "de", "het", "een", "en", "of", "maar", "is", "zijn", "was",
        "niet", "met", "van", "te", "in", "op", "aan", "voor", "naar",
        "bij", "uit", "over", "onder", "dat", "die", "deze", "dit",
        "er", "ook", "als", "dan", "om", "door", "tot", "hij", "zij",
        "we", "ze", "ik", "je", "u", "hun", "haar", "hem", "wordt",
    ],
    "swedish": [
        "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
        "den", "med", "var", "sig", "för", "så", "till", "är", "men",
        "ett", "om", "hade", "de", "av", "icke", "mig", "du",
    ],
    "norwegian": [
        "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
        "som", "på", "de", "med", "han", "av", "ikke", "der", "så",
        "var", "meg", "seg", "men", "har", "om", "vi",
    ],
    "danish": [
        "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som",
        "på", "de", "med", "han", "af", "ikke", "der", "så", "var",
        "mig", "sig", "men", "et", "har", "om", "vi",
    ],
    # comma-below AND legacy cedilla spellings both listed: the stop filter
    # runs on raw lowercased tokens BEFORE the stemmer's ş→ș normalization
    "romanian": [
        "și", "şi", "în", "la", "cu", "de", "pe", "un", "o", "este",
        "sunt", "care", "nu", "se", "din", "mai", "dar", "sau", "ce",
        "să", "sã", "au", "a", "al", "ai", "ale", "lui", "ei", "lor",
        "că", "cã", "le", "pentru", "fi", "fost", "când", "acest",
        "această", "prin", "după", "ca", "până", "fără",
    ],
    # single letters d/l/m/n/s/t = the elided articles ("l'índex" tokenizes
    # to "l" + "índex" under the apostrophe-splitting tokenizer; stopping
    # the article half replicates Lucene CatalanAnalyzer's ElisionFilter)
    "catalan": [
        "de", "la", "el", "els", "les", "i", "a", "en", "per", "amb",
        "un", "una", "uns", "unes", "que", "què", "qui", "es", "se",
        "no", "com", "més", "o", "si", "ja", "hi", "ho", "aquest",
        "aquesta", "aquests", "aquestes", "això", "seu", "seva", "sobre",
        "entre", "fins", "des", "del", "dels", "al", "als", "també",
        "però", "quan", "on", "tot", "ser", "és", "són", "ha", "han",
        "d", "l", "m", "n", "s", "t",
    ],
    "czech": [
        "a", "aby", "ale", "ani", "až", "bez", "bude", "by", "byl",
        "byla", "bylo", "být", "co", "do", "i", "já", "jak", "jako",
        "je", "jeho", "jen", "ji", "jsem", "jsou", "k", "kde", "když",
        "ke", "která", "který", "na", "nad", "ne", "nebo", "není", "o",
        "od", "on", "po", "pod", "pro", "při", "s", "se", "si", "ta",
        "tak", "také", "ten", "to", "u", "už", "v", "ve", "z", "za", "že",
    ],
    "bulgarian": [
        "и", "в", "във", "на", "с", "със", "за", "от", "по", "не",
        "да", "е", "се", "че", "ще", "като", "но", "или", "ако",
        "той", "тя", "то", "те", "са", "бе", "при", "към", "над",
        "под", "след", "преди", "това", "този", "тази", "има",
        "беше", "ни", "ви", "му", "аз", "ти", "ние", "вие",
    ],
    # surface forms (the stop filter runs BEFORE the arabic chain's
    # normalizer, matching Lucene's ArabicAnalyzer filter order)
    "arabic": [
        "من", "في", "على", "أن", "إن", "إلى", "عن", "مع", "هذا", "هذه",
        "ذلك", "التي", "الذي", "الذين", "ما", "لا", "لم", "لن", "هو",
        "هي", "هم", "كان", "كانت", "يكون", "أو", "ثم", "قد", "كل",
        "بعد", "قبل", "بين", "حتى", "إذا", "كما", "أي", "عند", "منذ",
        "غير", "أيضا", "و",
    ],
    "indonesian": [
        "yang", "dan", "di", "ke", "dari", "untuk", "pada", "dengan",
        "dalam", "adalah", "ini", "itu", "tidak", "akan", "juga", "atau",
        "saya", "kami", "kita", "mereka", "dia", "ada", "sudah", "telah",
        "bisa", "dapat", "karena", "oleh", "seperti", "jika", "maka",
        "lebih", "hanya", "masih", "harus", "saat", "ketika", "secara",
        "antara", "tersebut", "serta", "bahwa", "ia", "pun",
    ],
    # NORMALIZED forms (post Hindi-normalization): the hindi chain's stop
    # filter runs after the normalizer, before the stemmer (Lucene
    # HindiAnalyzer filter order)
    "hindi": [
        "के", "का", "की", "को", "में", "है", "हैं", "से", "और", "पर",
        "ही", "भी", "यह", "वह", "जो", "कि", "ने", "हो", "था", "थी",
        "थे", "इस", "उस", "एक", "नहीं", "तो", "कर", "रहा", "रही",
        "रहे", "अपने", "लिए", "साथ", "बाद", "हम", "आप", "वे", "कुछ",
        "गया", "हुआ", "हुई", "या", "होता", "होती", "बहुत",
    ],
    # NORMALIZED forms (ي not ی, ك not ک): the persian chain's stop filter
    # runs AFTER Arabic+Persian normalization, matching Lucene's
    # PersianAnalyzer filter order
    "persian": [
        "از", "به", "با", "در", "كه", "را", "اين", "ان", "است", "بود",
        "شد", "شود", "مي", "ها", "هاي", "براي", "تا", "هم", "نيز",
        "يك", "او", "ما", "شما", "من", "تو", "بر", "يا", "اگر", "هر",
        "چه", "اما", "و", "هستند", "كرد", "كند", "دارد", "باشد", "بي",
    ],
    # stopword-only chains over the unicode tokenizer (no stemmer yet —
    # the documented pre-stemmer stage for the reference's el analyzer)
    "russian": [
        "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как",
        "а", "то", "все", "она", "так", "его", "но", "да", "ты", "к",
        "у", "же", "вы", "за", "бы", "по", "только", "ее", "мне",
        "было", "вот", "от", "меня", "еще", "нет", "о", "из", "ему",
    ],
    # stored fully POST-NORMALIZATION (σ-folded AND accent-free: τησ, ωσ,
    # ειναι, απο): the stop filter runs after the tokenizer's ς→σ fold and
    # the chain's accent fold, matching Lucene's GreekAnalyzer whose stop
    # set is post-GreekLowerCaseFilter form ("ή" folds onto the article
    # "η", so one entry covers both)
    "greek": [
        "ο", "η", "το", "οι", "τα", "του", "τησ", "των", "τον", "την",
        "και", "να", "με", "σε", "για", "ειναι", "απο", "δεν", "θα",
        "που", "αυτο", "στο", "στη", "ωσ", "αν",
    ],
    # Finnish function words (Lucene FinnishAnalyzer's high-frequency
    # core; the Snowball-distributed list's most common entries)
    "finnish": [
        "olla", "olen", "on", "oli", "ollut", "ja", "ei", "se", "että",
        "hän", "joka", "mikä", "mitä", "tämä", "tuo", "ne", "nämä",
        "kun", "niin", "kuin", "mutta", "jos", "myös", "sekä", "tai",
        "vain", "vielä", "jo", "sitä", "sen", "siinä", "sitten",
        "kanssa", "ole", "siis", "minä", "sinä", "me", "te", "he",
    ],
    # Hungarian function words (Lucene HungarianAnalyzer's core)
    "hungarian": [
        "a", "az", "és", "egy", "hogy", "nem", "is", "de", "ez", "azt",
        "meg", "ha", "mint", "már", "csak", "vagy", "még", "volt",
        "van", "lesz", "el", "ki", "fel", "le", "be", "mert", "pedig",
        "úgy", "így", "aki", "ami", "amely", "után", "előtt", "között",
        "által", "ezt", "ilyen", "olyan", "majd", "itt", "ott",
        "akkor", "most", "azonban", "szerint",
    ],
    # Turkish function words (Lucene TurkishAnalyzer's set, the
    # high-frequency core) — compared post-tokenizer (İ/I folded, lowered),
    # BEFORE the stemmer like Lucene's filter order
    "turkish": [
        "acaba", "ama", "ancak", "aslında", "bana", "bazı", "belki",
        "ben", "beni", "benim", "bile", "bir", "birçok", "biri",
        "birkaç", "biz", "bize", "bizi", "bizim", "böyle", "bu", "buna",
        "bunda", "bundan", "bunlar", "bunu", "bunun", "burada", "çok",
        "çünkü", "da", "daha", "de", "değil", "diğer", "diye", "dolayı",
        "en", "gibi", "hem", "hep", "hepsi", "her", "hiç", "için",
        "iki", "ile", "ilgili", "ise", "işte", "kadar", "kendi", "ki",
        "kim", "mı", "mi", "mu", "mü", "nasıl", "ne", "neden", "nerede",
        "niçin", "niye", "o", "olan", "olarak", "oldu", "ona", "ondan",
        "onlar", "onu", "onun", "öyle", "sadece", "sanki", "sen", "siz",
        "şey", "şu", "tüm", "ve", "veya", "ya", "yani", "yine", "zaten",
    ],
    # Baltic + Estonian function words (surface forms; the stop filter
    # runs before the lightgen stemmers like the other Latin chains)
    "latvian": [
        "un", "ir", "es", "tu", "viņš", "viņa", "mēs", "jūs", "tie",
        "tās", "kas", "ko", "kur", "kad", "kā", "ne", "nē", "jā", "par",
        "pie", "no", "uz", "ar", "bez", "pēc", "līdz", "šis", "šī",
        "tas", "tā", "vai", "arī", "bet", "ja", "lai", "jau", "vēl",
        "tikai", "būt", "bija",
    ],
    "lithuanian": [
        "ir", "yra", "aš", "tu", "jis", "ji", "mes", "jūs", "jie",
        "jos", "kas", "ką", "kur", "kada", "kaip", "ne", "taip", "apie",
        "po", "prie", "nuo", "į", "su", "be", "per", "šis", "ši",
        "tas", "ta", "ar", "arba", "bet", "jei", "kad", "jau", "dar",
        "tik", "būti", "buvo", "o", "iš",
    ],
    "estonian": [
        "ja", "on", "ei", "ta", "sa", "ma", "me", "te", "nad", "see",
        "need", "mis", "kes", "kus", "kui", "siis", "aga", "või", "ka",
        "veel", "juba", "ainult", "olema", "oli", "olid", "tema", "oma",
        "seda", "selle", "nii", "ning", "üle", "alla", "peale",
        "pärast", "enne", "ilma", "koos", "vastu",
    ],
    "galician": [
        "a", "o", "as", "os", "un", "unha", "uns", "unhas", "e", "ou",
        "mais", "pero", "de", "do", "da", "dos", "das", "en", "no",
        "na", "nos", "nas", "por", "para", "con", "sen", "que", "se",
        "non", "é", "son", "ao", "aos", "á", "ás", "seu", "súa",
        "este", "esta", "iso", "el", "ela", "eles", "elas", "como",
        "máis", "foi", "xa", "tamén",
    ],
    "basque": [
        "eta", "edo", "baina", "da", "dira", "zen", "ziren", "ez",
        "bai", "ni", "zu", "gu", "hura", "hau", "hori", "bat",
        "batzuk", "ere", "oso", "baino", "gabe", "arte", "zer", "nor",
        "non", "noiz", "nola", "zergatik", "baita", "izan", "egin",
        "dute", "duen", "dela", "den",
    ],
    "irish": [
        "agus", "an", "na", "is", "tá", "ní", "go", "ar", "le", "i",
        "in", "de", "do", "a", "ag", "as", "ó", "faoi", "trí", "chun",
        "gan", "mar", "nó", "ach", "sé", "sí", "siad", "mé", "tú",
        "muid", "sibh", "seo", "sin", "bhí", "beidh", "atá", "é", "í",
        "iad", "ba",
    ],
    "polish": [
        "i", "w", "we", "na", "z", "ze", "do", "od", "po", "za",
        "przez", "dla", "bez", "o", "u", "a", "ale", "lub", "albo",
        "że", "się", "nie", "tak", "to", "ten", "ta", "te", "jest",
        "są", "był", "była", "było", "być", "będzie", "jak", "co",
        "kto", "gdzie", "kiedy", "oraz", "czy", "już", "też", "tylko",
        "może", "ich", "jego", "jej", "ma", "mają",
    ],
    # Ukrainian function words (surface forms; stop runs before the
    # lightgen stemmer like the other Cyrillic chains)
    "ukrainian": [
        "і", "й", "та", "в", "у", "на", "з", "із", "зі", "до", "від",
        "за", "про", "при", "під", "над", "для", "без", "не", "ні",
        "що", "як", "але", "або", "чи", "це", "цей", "ця", "ці", "той",
        "те", "ті", "він", "вона", "воно", "вони", "ми", "ви",
        "я", "ти", "його", "її", "їх", "так", "вже", "ще", "тільки",
        "є", "був", "була", "було", "бути", "би", "б", "же",
    ],
    # Serbian function words — compared POST-normalization (the bald
    # Cyrillic→Latin fold), so Cyrillic и and Latin i hit the same entry
    "serbian": [
        "и", "у", "на", "је", "се", "да", "су", "за", "од", "до", "не",
        "што", "као", "али", "или", "то", "тај", "та", "ово", "он",
        "она", "они", "ми", "ви", "са", "по", "при", "ако", "кад",
        "већ", "само", "још", "бити", "био", "била", "било", "ће",
        "би", "смо", "сте", "а", "о",
    ],
    "armenian": [
        "և", "ու", "է", "են", "եմ", "ես", "այս", "այդ", "այն", "որ",
        "որը", "ինչ", "չի", "չեն", "մի", "էր", "էին", "կա", "կան",
        "բայց", "կամ", "էլ", "նաև", "իր", "նրա", "մենք", "դուք",
        "նրանք", "նա", "դա", "սա", "թե", "ոչ", "այո", "մեջ", "վրա",
        "հետ", "համար", "մասին", "առանց",
    ],
    "tamil": [
        "மற்றும்", "அல்லது", "ஆனால்", "இது", "அது", "எது", "இந்த",
        "அந்த", "எந்த", "நான்", "நீ", "அவன்", "அவள்", "அவர்",
        "நாம்", "நீங்கள்", "அவர்கள்", "என்று", "என", "ஒரு", "உள்ள",
        "இல்லை", "ஆம்", "மிக", "எப்படி", "எங்கே", "எப்போது", "ஏன்",
        "தான்", "கூட", "வேண்டும்", "முடியும்", "இருந்து", "வரை",
    ],
    # Bengali function words — compared POST-normalization (nukta
    # compositions), matching the norm→stop→stem chain order
    "bengali": [
        "এবং", "ও", "বা", "কিন্তু", "না", "হয়", "হবে", "ছিল", "করে",
        "থেকে", "জন্য", "সাথে", "এই", "সে", "তারা", "আমরা", "তুমি",
        "আপনি", "যে", "কি", "কে", "কোন", "এর", "তার", "আমার",
        "একটি", "একটা", "আছে", "নেই", "এটি", "এটা", "যা", "তা",
        "কেন", "কখন", "কোথায়", "কীভাবে", "আর", "তবে", "যদি",
    ],
    # Sorani Kurdish function words — compared POST-normalization
    "sorani": [
        "و", "لە", "بە", "بۆ", "کە", "ئەم", "ئەو", "ئەوە", "من",
        "تۆ", "ئێمە", "ئێوە", "ئەوان", "چی", "کێ", "چۆن", "بەڵام",
        "یان", "نە", "هەر", "هەموو", "لەگەڵ", "دوای", "پێش", "بێ",
        "بوو", "نییە", "هەیە", "وەک", "تا", "جا", "دە", "ناو",
    ],
    # CJKAnalyzer's default stop set (English function words + www/s/t) —
    # applied AFTER bigramming, so only non-CJK tokens can ever match it
    "cjk": [
        "a", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "s",
        "such", "t", "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with", "www",
    ],
}

# Brazilian Portuguese shares the Portuguese function words (the reference
# keeps the LANGUAGES distinct for their stemmers, not their stop sets).
# ThaiAnalyzer's real stop set applies to DICTIONARY-segmented words; the
# bigram analog can only stop the non-Thai (Latin) tokens, so it shares
# the CJK chain's English set — documented narrowing.
LANG_STOPWORDS["brazilian"] = list(LANG_STOPWORDS["portuguese"])
LANG_STOPWORDS["thai"] = list(LANG_STOPWORDS["cjk"])


# Stopword-only chain constructors — the registry extension point for the
# reference's remaining languages that have a stop list but no Snowball
# stemmer implemented here yet (add `"lang": (_stop_col(words),
# _stop_py(words))` to ANALYZERS).
def _stop_col(stops: list[str], tok_col=None):
    sset = set(stops)
    tok_col = tok_col or tokenize_col

    def col_fn(col: Column) -> Column:
        toks = tok_col(col)
        return F.filter(toks, lambda t: ~t.isin(list(sset)))

    return col_fn


def _stop_py(stops: list[str], tok_py=None):
    sset = set(stops)
    tok_py = tok_py or tokenize_py

    def py_fn(text: str | None) -> list[str]:
        return [t for t in tok_py(text) if t not in sset]

    return py_fn


# Stemming analyzers = the Lucene per-language chains (reference
# Language.scala:52-99): tokenize → stopwords → stemmer. english uses the
# ASCII standard tokenizer + Porter; german/french use the Unicode-Latin
# tokenizer + the published Snowball algorithms (snowball.py). The column
# form is an Arrow-batched pandas_udf running the SAME python chain
# (equivalence by construction; per-batch stem memoization keeps the cost
# ~vocab-sized, not token-sized). This is the documented UDF surface —
# stemming is per-token conditional logic Catalyst can't express.


def _porter_stem(t: str) -> str:
    from nixiesearch_spark.stem import porter_py

    return porter_py(t)


def _german_stem(t: str) -> str:
    from nixiesearch_spark.snowball import german_py

    return german_py(t)


def _french_stem(t: str) -> str:
    from nixiesearch_spark.snowball import french_py

    return french_py(t)


def _spanish_stem(t: str) -> str:
    from nixiesearch_spark.snowball import spanish_py

    return spanish_py(t)


def _italian_stem(t: str) -> str:
    from nixiesearch_spark.snowball import italian_py

    return italian_py(t)


def _portuguese_stem(t: str) -> str:
    from nixiesearch_spark.snowball import portuguese_py

    return portuguese_py(t)


def _dutch_stem(t: str) -> str:
    from nixiesearch_spark.snowball import dutch_py

    return dutch_py(t)


def _romanian_stem(t: str) -> str:
    from nixiesearch_spark.snowball import romanian_py

    return romanian_py(t)


def _catalan_stem(t: str) -> str:
    from nixiesearch_spark.snowball import catalan_py

    return catalan_py(t)


def _russian_stem(t: str) -> str:
    from nixiesearch_spark.snowball import russian_py

    return russian_py(t)


def _arabic_stem(t: str) -> str:
    from nixiesearch_spark.light import arabic_py

    return arabic_py(t)


def _bulgarian_stem(t: str) -> str:
    from nixiesearch_spark.light import bulgarian_py

    return bulgarian_py(t)


def _czech_stem(t: str) -> str:
    from nixiesearch_spark.light import czech_py

    return czech_py(t)


def _swedish_stem(t: str) -> str:
    from nixiesearch_spark.snowball import swedish_py

    return swedish_py(t)


def _norwegian_stem(t: str) -> str:
    from nixiesearch_spark.snowball import norwegian_py

    return norwegian_py(t)


def _danish_stem(t: str) -> str:
    from nixiesearch_spark.snowball import danish_py

    return danish_py(t)


def _persian_norm(t: str) -> str:
    from nixiesearch_spark.light import persian_py

    return persian_py(t)


def _indonesian_stem(t: str) -> str:
    from nixiesearch_spark.light import indonesian_py

    return indonesian_py(t)


def _hindi_norm(t: str) -> str:
    from nixiesearch_spark.light import hindi_norm_py

    return hindi_norm_py(t)


def _hindi_stem(t: str) -> str:
    from nixiesearch_spark.light import hindi_stem_py

    return hindi_stem_py(t)


def _finnish_stem(t: str) -> str:
    from nixiesearch_spark.snowball import finnish_py

    return finnish_py(t)


def _hungarian_stem(t: str) -> str:
    from nixiesearch_spark.snowball import hungarian_py

    return hungarian_py(t)


def _turkish_stem(t: str) -> str:
    from nixiesearch_spark.light import turkish_py

    return turkish_py(t)


def _latvian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import latvian_py

    return latvian_py(t)


def _lithuanian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import lithuanian_py

    return lithuanian_py(t)


def _estonian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import estonian_py

    return estonian_py(t)


def _galician_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import galician_py

    return galician_py(t)


def _basque_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import basque_py

    return basque_py(t)


def _irish_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import irish_py

    return irish_py(t)


def _polish_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import polish_py

    return polish_py(t)


def _ukrainian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import ukrainian_py

    return ukrainian_py(t)


def _armenian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import armenian_py

    return armenian_py(t)


def _tamil_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import tamil_py

    return tamil_py(t)


def _brazilian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import brazilian_py

    return brazilian_py(t)


def _serbian_norm(t: str) -> str:
    from nixiesearch_spark.lightgen import serbian_norm_py

    return serbian_norm_py(t)


def _serbian_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import serbian_phases_py

    return serbian_phases_py(t)


def _bengali_norm(t: str) -> str:
    from nixiesearch_spark.lightgen import bengali_norm_py

    return bengali_norm_py(t)


def _bengali_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import bengali_phases_py

    return bengali_phases_py(t)


def _sorani_norm(t: str) -> str:
    from nixiesearch_spark.lightgen import sorani_norm_py

    return sorani_norm_py(t)


def _sorani_stem(t: str) -> str:
    from nixiesearch_spark.lightgen import sorani_phases_py

    return sorani_phases_py(t)


def _greek_norm(t: str) -> str:
    from nixiesearch_spark.greek import greek_norm_py

    return greek_norm_py(t)


def _greek_stem(t: str) -> str:
    from nixiesearch_spark.greek import greek_stem_py

    return greek_stem_py(t)


# norm → stop → stem chain (hindi): normalization first, the stop filter
# compares normalized tokens, survivors are stemmed (Lucene HindiAnalyzer
# filter order)
def _norm_stop_stem_py(stops: list[str], norm_fn, stem_fn, tok_fn):
    sset = {norm_fn(t) for t in stops}

    def py_fn(text: str | None) -> list[str]:
        out = []
        for t in tok_fn(text):
            n = norm_fn(t)
            if n not in sset:
                out.append(stem_fn(n))
        return out

    return py_fn


def _norm_stop_stem_col(stops: list[str], norm_fn, stem_fn, tok_fn):
    sset = {norm_fn(t) for t in stops}

    def col_fn(col: Column) -> Column:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        @pandas_udf(ArrayType(StringType()))
        def _udf(s: pd.Series) -> pd.Series:
            memo: dict = {}

            def run(x):
                out = []
                for t in tok_fn(x):
                    v = memo.get(t)
                    if v is None:
                        n = norm_fn(t)
                        memo[t] = v = ("", True) if n in sset else (stem_fn(n), False)
                    stem, stop = v
                    if not stop:
                        out.append(stem)
                return out

            return s.map(run)

        return _udf(col)

    return col_fn


def _stem_py(stops: list[str], stem_fn=_porter_stem, tok_fn=tokenize_py):
    sset = set(stops)

    def py_fn(text: str | None) -> list[str]:
        return [stem_fn(t) for t in tok_fn(text) if t not in sset]

    return py_fn


def _stem_col(stops: list[str], stem_fn=_porter_stem, tok_fn=tokenize_py):
    sset = set(stops)

    def col_fn(col: Column) -> Column:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        @pandas_udf(ArrayType(StringType()))
        def _udf(s: pd.Series) -> pd.Series:
            memo: dict = {}

            def stem(t: str) -> str:
                v = memo.get(t)
                if v is None:
                    memo[t] = v = stem_fn(t)
                return v

            return s.map(
                lambda x: [stem(t) for t in tok_fn(x) if t not in sset]
            )

        return _udf(col)

    return col_fn


ANALYZERS = {
    "standard": (tokenize_col, tokenize_py),
    "whitespace": (_whitespace_col, _whitespace_py),
    "keyword": (_keyword_col, _keyword_py),
    "english": (_stem_col(LANG_STOPWORDS["english"]), _stem_py(LANG_STOPWORDS["english"])),
    "german": (
        _stem_col(LANG_STOPWORDS["german"], _german_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["german"], _german_stem, tokenize_latin_py),
    ),
    "french": (
        _stem_col(LANG_STOPWORDS["french"], _french_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["french"], _french_stem, tokenize_latin_py),
    ),
    "spanish": (
        _stem_col(LANG_STOPWORDS["spanish"], _spanish_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["spanish"], _spanish_stem, tokenize_latin_py),
    ),
    "italian": (
        _stem_col(LANG_STOPWORDS["italian"], _italian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["italian"], _italian_stem, tokenize_latin_py),
    ),
    "portuguese": (
        _stem_col(LANG_STOPWORDS["portuguese"], _portuguese_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["portuguese"], _portuguese_stem, tokenize_latin_py),
    ),
    "dutch": (
        _stem_col(LANG_STOPWORDS["dutch"], _dutch_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["dutch"], _dutch_stem, tokenize_latin_py),
    ),
    "swedish": (
        _stem_col(LANG_STOPWORDS["swedish"], _swedish_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["swedish"], _swedish_stem, tokenize_latin_py),
    ),
    "norwegian": (
        _stem_col(LANG_STOPWORDS["norwegian"], _norwegian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["norwegian"], _norwegian_stem, tokenize_latin_py),
    ),
    "danish": (
        _stem_col(LANG_STOPWORDS["danish"], _danish_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["danish"], _danish_stem, tokenize_latin_py),
    ),
    "romanian": (
        _stem_col(LANG_STOPWORDS["romanian"], _romanian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["romanian"], _romanian_stem, tokenize_latin_py),
    ),
    # Snowball Catalan over the Catalan tokenizer ('·' is a word char so
    # l·l words stay whole; elision via apostrophe split + article stops)
    "catalan": (
        _stem_col(LANG_STOPWORDS["catalan"], _catalan_stem, tokenize_catalan_py),
        _stem_py(LANG_STOPWORDS["catalan"], _catalan_stem, tokenize_catalan_py),
    ),
    # Tala-stemmer Indonesian over the ASCII standard tokenizer (the
    # language is plain Latin, like english)
    "indonesian": (
        _stem_col(LANG_STOPWORDS["indonesian"], _indonesian_stem),
        _stem_py(LANG_STOPWORDS["indonesian"], _indonesian_stem),
    ),
    # Dolamic & Savoy Czech light stemmer over the Unicode-Latin tokenizer
    "czech": (
        _stem_col(LANG_STOPWORDS["czech"], _czech_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["czech"], _czech_stem, tokenize_latin_py),
    ),
    # unicode-class chains: standard_unicode/greek are pure Catalyst
    # (tokenizer + stopwords, no UDF); russian is the full Lucene
    # RussianAnalyzer analog (stop + Snowball Russian stemmer)
    "standard_unicode": (tokenize_unicode_col, tokenize_unicode_py),
    "russian": (
        _stem_col(LANG_STOPWORDS["russian"], _russian_stem, tokenize_unicode_py),
        _stem_py(LANG_STOPWORDS["russian"], _russian_stem, tokenize_unicode_py),
    ),
    # full Lucene GreekAnalyzer analog: unicode tokenize (lower + ς→σ) →
    # accent fold (GreekLowerCaseFilter's diacritic removal) → stop
    # (post-norm forms) → Ntais/Saroukos stemmer (greek.py)
    "greek": (
        _norm_stop_stem_col(
            LANG_STOPWORDS["greek"], _greek_norm, _greek_stem, tokenize_unicode_py
        ),
        _norm_stop_stem_py(
            LANG_STOPWORDS["greek"], _greek_norm, _greek_stem, tokenize_unicode_py
        ),
    ),
    # Snowball Finnish / Hungarian over the Unicode-Latin tokenizer
    "finnish": (
        _stem_col(LANG_STOPWORDS["finnish"], _finnish_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["finnish"], _finnish_stem, tokenize_latin_py),
    ),
    "hungarian": (
        _stem_col(LANG_STOPWORDS["hungarian"], _hungarian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["hungarian"], _hungarian_stem, tokenize_latin_py),
    ),
    # lightgen rule-table chains over the Unicode-Latin tokenizer:
    # latvian = the Lucene LatvianStemmer light-affix table; lithuanian /
    # estonian = documented light analogs of the Snowball bindings
    # (lightgen.py spec docnotes)
    "latvian": (
        _stem_col(LANG_STOPWORDS["latvian"], _latvian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["latvian"], _latvian_stem, tokenize_latin_py),
    ),
    "lithuanian": (
        _stem_col(LANG_STOPWORDS["lithuanian"], _lithuanian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["lithuanian"], _lithuanian_stem, tokenize_latin_py),
    ),
    "estonian": (
        _stem_col(LANG_STOPWORDS["estonian"], _estonian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["estonian"], _estonian_stem, tokenize_latin_py),
    ),
    "galician": (
        _stem_col(LANG_STOPWORDS["galician"], _galician_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["galician"], _galician_stem, tokenize_latin_py),
    ),
    "basque": (
        _stem_col(LANG_STOPWORDS["basque"], _basque_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["basque"], _basque_stem, tokenize_latin_py),
    ),
    "irish": (
        _stem_col(LANG_STOPWORDS["irish"], _irish_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["irish"], _irish_stem, tokenize_latin_py),
    ),
    "polish": (
        _stem_col(LANG_STOPWORDS["polish"], _polish_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["polish"], _polish_stem, tokenize_latin_py),
    ),
    # RSLP-lite Brazilian chain (distinct from the Snowball Portuguese
    # chain, like the reference's pt vs br split — lightgen.py BRAZILIAN)
    "brazilian": (
        _stem_col(LANG_STOPWORDS["brazilian"], _brazilian_stem, tokenize_latin_py),
        _stem_py(LANG_STOPWORDS["brazilian"], _brazilian_stem, tokenize_latin_py),
    ),
    # lightgen Cyrillic chains: ukrainian = light analog (Morfologik
    # dictionary deferral, PARITY.md); serbian = bald Cyrillic→Latin fold
    # (SerbianNormalizationFilter analog) → stop (post-norm) → light stem
    "ukrainian": (
        _stem_col(LANG_STOPWORDS["ukrainian"], _ukrainian_stem, tokenize_unicode_py),
        _stem_py(LANG_STOPWORDS["ukrainian"], _ukrainian_stem, tokenize_unicode_py),
    ),
    "serbian": (
        _norm_stop_stem_col(
            LANG_STOPWORDS["serbian"], _serbian_norm, _serbian_stem, tokenize_unicode_py
        ),
        _norm_stop_stem_py(
            LANG_STOPWORDS["serbian"], _serbian_norm, _serbian_stem, tokenize_unicode_py
        ),
    ),
    # Armenian / Tamil light chains over the unicode tokenizer (script
    # blocks added to the class above)
    "armenian": (
        _stem_col(LANG_STOPWORDS["armenian"], _armenian_stem, tokenize_unicode_py),
        _stem_py(LANG_STOPWORDS["armenian"], _armenian_stem, tokenize_unicode_py),
    ),
    "tamil": (
        _stem_col(LANG_STOPWORDS["tamil"], _tamil_stem, tokenize_unicode_py),
        _stem_py(LANG_STOPWORDS["tamil"], _tamil_stem, tokenize_unicode_py),
    ),
    # Bengali / Sorani norm → stop → stem chains (Lucene filter order:
    # normalization first, stop compared on normalized forms)
    "bengali": (
        _norm_stop_stem_col(
            LANG_STOPWORDS["bengali"], _bengali_norm, _bengali_stem, tokenize_unicode_py
        ),
        _norm_stop_stem_py(
            LANG_STOPWORDS["bengali"], _bengali_norm, _bengali_stem, tokenize_unicode_py
        ),
    ),
    "sorani": (
        _norm_stop_stem_col(
            LANG_STOPWORDS["sorani"], _sorani_norm, _sorani_stem, tokenize_unicode_py
        ),
        _norm_stop_stem_py(
            LANG_STOPWORDS["sorani"], _sorani_norm, _sorani_stem, tokenize_unicode_py
        ),
    ),
    # Thai run-bigram chain — pure Catalyst like cjk (dictionary
    # segmentation deferred, see _make_bigram_forms docnote)
    "thai": (
        _stop_col(LANG_STOPWORDS["thai"], tokenize_thai_col),
        _stop_py(LANG_STOPWORDS["thai"], tokenize_thai_py),
    ),
    # Lucene TurkishAnalyzer analog: apostrophe filter + İ/I case fold in
    # the tokenizer, stop (surface forms), Çilden suffix-strip stemmer
    "turkish": (
        _stem_col(LANG_STOPWORDS["turkish"], _turkish_stem, tokenize_turkish_py),
        _stem_py(LANG_STOPWORDS["turkish"], _turkish_stem, tokenize_turkish_py),
    ),
    # CJKAnalyzer analog (zh/ja/ko): width fold + char bigrams + English
    # stop set — pure Catalyst like standard_unicode/greek, no UDF
    "cjk": (
        _stop_col(LANG_STOPWORDS["cjk"], tokenize_cjk_col),
        _stop_py(LANG_STOPWORDS["cjk"], tokenize_cjk_py),
    ),
    # full Lucene ArabicAnalyzer analog: unicode tokenize → stop (surface
    # forms) → normalization + light10 stem (light.py)
    "arabic": (
        _stem_col(LANG_STOPWORDS["arabic"], _arabic_stem, tokenize_unicode_py),
        _stem_py(LANG_STOPWORDS["arabic"], _arabic_stem, tokenize_unicode_py),
    ),
    # Savoy Bulgarian light stemmer over the unicode (Cyrillic) tokenizer
    "bulgarian": (
        _stem_col(LANG_STOPWORDS["bulgarian"], _bulgarian_stem, tokenize_unicode_py),
        _stem_py(LANG_STOPWORDS["bulgarian"], _bulgarian_stem, tokenize_unicode_py),
    ),
    # Lucene PersianAnalyzer analog: normalize (Arabic + Persian folds)
    # then stop — no stemmer exists for fa in Lucene either
    "persian": (
        _norm_stop_stem_col(
            LANG_STOPWORDS["persian"], _persian_norm, lambda t: t, tokenize_unicode_py
        ),
        _norm_stop_stem_py(
            LANG_STOPWORDS["persian"], _persian_norm, lambda t: t, tokenize_unicode_py
        ),
    ),
    # Lucene HindiAnalyzer analog: Devanagari tokenize → Hindi
    # normalization → stop (normalized forms) → Ramanathan-Rao light stem
    "hindi": (
        _norm_stop_stem_col(
            LANG_STOPWORDS["hindi"], _hindi_norm, _hindi_stem, tokenize_unicode_py
        ),
        _norm_stop_stem_py(
            LANG_STOPWORDS["hindi"], _hindi_norm, _hindi_stem, tokenize_unicode_py
        ),
    ),
}


# analyzers whose column form is an Arrow pandas_udf (cannot run inside
# F.transform lambdas — text[] fields concat items first for these)
UDF_ANALYZERS = {
    "english", "german", "french", "spanish", "italian", "portuguese",
    "dutch", "russian", "swedish", "norwegian", "danish", "romanian",
    "arabic", "bulgarian", "czech", "persian", "hindi", "indonesian",
    "catalan", "greek", "turkish", "finnish", "hungarian",
    "latvian", "lithuanian", "estonian", "galician", "basque", "irish",
    "polish", "ukrainian", "serbian", "armenian", "tamil", "bengali",
    "sorani", "brazilian",
}


def analyzer_col(name: str):
    return ANALYZERS[name][0]


def analyzer_py(name: str):
    return ANALYZERS[name][1]


# executors may not have this package on their import path (host sessions
# with a foreign cwd) — ship the analyzer/stemmer modules by value once at
# import, like index.builder does for codec/lucene
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    from nixiesearch_spark import greek as _greek_mod
    from nixiesearch_spark import light as _light_mod
    from nixiesearch_spark import lightgen as _lightgen_mod
    from nixiesearch_spark import snowball as _snowball_mod
    from nixiesearch_spark import stem as _stem_mod

    _cp.register_pickle_by_value(_stem_mod)
    _cp.register_pickle_by_value(_snowball_mod)
    _cp.register_pickle_by_value(_light_mod)
    _cp.register_pickle_by_value(_greek_mod)
    _cp.register_pickle_by_value(_lightgen_mod)
    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - best effort on older pyspark
    pass


def tokenize_arrow_batches(texts):
    """Tokenize a pandas Series of strings → list[list[str]].

    Used inside mapInArrow/applyInPandas passes; pandas .str ops keep the
    loop in C where possible, and there is no per-row Python UDF dispatch.
    """
    s = texts.fillna("").str.slice(0, MAX_FIELD_SEARCH_SIZE).str.lower()
    split = s.str.split(TOKEN_SPLIT_REGEX, regex=True)
    return [
        [t for t in toks if t and len(t) <= MAX_TOKEN_LENGTH] if toks is not None else []
        for toks in split
    ]
