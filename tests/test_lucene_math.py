import numpy as np

from nixiesearch_spark import lucene
from nixiesearch_spark.analysis import tokenize_py
from nixiesearch_spark.oracle import build_oracle_index, score_match


def test_smallfloat_properties():
    x = np.arange(0, 200000)
    e = lucene.int_to_byte4(x)
    d = lucene.byte4_to_int(e)
    assert np.all(np.diff(e) >= 0), "encode must be monotone"
    assert np.all(d <= x), "decode must round down"
    assert np.all(d[:16] == x[:16]), "values with <=4 significant bits are exact"
    b = np.arange(256)
    assert np.all(lucene.int_to_byte4(lucene.byte4_to_int(b)) == b), "byte fixpoint"


def test_smallfloat_known_values():
    # hand-computed against the SmallFloat algorithm (4-bit mantissa with
    # implicit leading bit + 5-bit shift)
    known = {0: 0, 1: 1, 7: 7, 8: 8, 15: 15, 16: 16, 17: 16, 18: 17, 40: 26, 1000: 63}
    for i, b in known.items():
        assert int(lucene.int_to_byte4(i)) == b, (i, int(lucene.int_to_byte4(i)), b)
    assert int(lucene.byte4_to_int(26)) == 40
    assert int(lucene.byte4_to_int(63)) == 960


def test_idf_and_weight():
    # df=1, N=3: ln(1 + 2.5/1.5)
    assert abs(float(lucene.idf(1, 3)) - np.log(1 + 2.5 / 1.5)) < 1e-12
    w = lucene.term_weight(1, 3)
    assert w.dtype == np.float32


def test_tokenizer():
    assert tokenize_py("Red  DRESS!") == ["red", "dress"]
    assert tokenize_py("foo_bar baz-qux") == ["foo_bar", "baz", "qux"]
    assert tokenize_py(None) == []
    assert tokenize_py("...") == []
    long_tok = "a" * 256
    assert tokenize_py(f"ok {long_tok} fine") == ["ok", "fine"]
    # 32000-char truncation before analysis (reference TextFieldCodec.scala:147)
    text = ("word " * 10000)[:40000]
    assert len(tokenize_py(text)) == 32000 // 5


def test_oracle_matches_reference_fixture():
    # reference MatchQueryTest: query "pajama" over red dress/white dress/red
    # pajama returns exactly ["3"]
    ix = build_oracle_index([("1", "red dress"), ("2", "white dress"), ("3", "red pajama")])
    hits = score_match(ix, ["pajama"], "or", 10)
    assert [h[0] for h in hits] == ["3"]
    hits = score_match(ix, ["red", "dress"], "and", 10)
    assert [h[0] for h in hits] == ["1"]
    hits = score_match(ix, ["red", "dress"], "or", 10)
    assert [h[0] for h in hits] == ["1", "2", "3"]
    # equal-score tie breaks by docid asc
    assert hits[1][1] == hits[2][1]
