"""CJK bigram tokenizer (Lucene CJKAnalyzer analog): the three executable
forms — python re, Catalyst (Java regex + nested higher-order bigram
expansion), DuckDB (RE2 + lateral generate_series) — must tokenize
identically, including the fullwidth fold and the lone-char unigram rule."""

from __future__ import annotations

import duckdb

from nixiesearch_spark.analysis import (
    analyzer_py,
    cjk_tok_sql,
    tokenize_cjk_py,
)

SAMPLES = [
    "分散検索エンジン Spark で ＳＥＡＲＣＨ",  # Han+kana run, fullwidth fold
    "데이터베이스 검색",  # Hangul bigrams
    "漢",  # lone ideograph → unigram
    "ひらがな and カタカナー mix",  # prolonged mark ー inside the run
    "a漢b字c",  # CJK singletons split by Latin → unigrams
    "縦横無尽の全文検索",  # Han run crossing the の hiragana bridge
    "ｱｲｳ halfwidth katakana are delimiters",  # documented narrowing
    "１２３ｘ fullwidth digits fold to 123x",
    "",
    "!!! ・ 、。",  # CJK punctuation is a delimiter
    None,
]


def test_bigram_semantics():
    assert tokenize_cjk_py("検索") == ["検索"]
    assert tokenize_cjk_py("全文検索") == ["全文", "文検", "検索"]
    # runs cross sub-script boundaries (Han↔kana), like CJKBigramFilter's
    # shared character buffer over adjacent CJK-typed tokens
    assert tokenize_cjk_py("縦の横") == ["縦の", "の横"]
    # a lone CJK char with no CJK neighbour is a unigram
    assert tokenize_cjk_py("a漢b") == ["a", "漢", "b"]
    # fullwidth ASCII folds before lowercasing
    assert tokenize_cjk_py("ＡＢＣ") == ["abc"]


def test_python_vs_catalyst(spark):
    from pyspark.sql import functions as F

    from nixiesearch_spark.analysis import tokenize_cjk_col

    rows = [(i, t) for i, t in enumerate(SAMPLES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", tokenize_cjk_col(F.col("text")).alias("toks")
        ).collect()
    }
    # NULL input: Column form yields NULL (builder clamps downstream)
    want = {i: (tokenize_cjk_py(t) if t is not None else None) for i, t in rows}
    assert got == want


def test_python_vs_duckdb():
    con = duckdb.connect()
    vals = ",".join(
        f"({i}, {'NULL' if t is None else chr(39) + t.replace(chr(39), chr(39) * 2) + chr(39)})"
        for i, t in enumerate(SAMPLES)
    )
    con.execute(f"CREATE TABLE src AS SELECT * FROM (VALUES {vals}) v(doc_id, t)")
    rows = con.execute(
        "SELECT doc_id, term FROM (" + cjk_tok_sql("t") + ") q"
    ).fetchall()
    got: dict[int, list[str]] = {i: [] for i in range(len(SAMPLES))}
    for d, term in rows:
        got[d].append(term)
    for i, t in enumerate(SAMPLES):
        # the lateral join preserves no cross-token order guarantee;
        # BM25 needs only the multiset (tf counts), so compare sorted
        assert sorted(got[i]) == sorted(tokenize_cjk_py(t)), f"doc {i}"


def test_cjk_chain_stop_filter():
    # the English-style stop set runs after bigramming: CJK bigrams never
    # match it, Latin tokens do
    assert analyzer_py("cjk")("the 索引 t www") == ["索引"]
    assert analyzer_py("cjk")("全文検索 is fast") == ["全文", "文検", "検索", "fast"]
