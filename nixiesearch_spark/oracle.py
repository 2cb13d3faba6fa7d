"""Pure-Python/numpy BM25 oracle — the stand-in for "Lucene as ground truth".

The reference trusts Lucene for scoring and validates cross-implementation
numerics against Python golden values (reference
``e2e/EmbeddingPythonMatchTest.scala``, ``src/test/python/embed_tests/``).
We invert that: this oracle IS the Lucene-10.3-semantics implementation
(tokenizer + SmallFloat norm quantization + BM25 float math + docid-asc
tiebreak), WAND-free and exhaustive, and the Spark engine must be
rank-identical and float32-score-equal to it (tests/test_match_parity.py).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from nixiesearch_spark import lucene
from nixiesearch_spark.analysis import tokenize_py


@dataclass
class OracleIndex:
    doc_ids: list  # external docids, any orderable type
    norms: np.ndarray  # uint8 norm byte per doc (index-aligned with doc_ids)
    doc_lens: np.ndarray  # exact token count per doc
    postings: dict = field(default_factory=dict)  # term -> (doc_idx int64[], tf int64[])
    doc_count: int = 0
    sum_ttf: int = 0
    quantize: bool = True

    @property
    def avgdl(self) -> float:
        if self.quantize:
            return float(lucene.avg_field_length(self.sum_ttf, self.doc_count))
        return self.sum_ttf / self.doc_count


def build_oracle_index(docs: list[tuple], quantize: bool = True) -> OracleIndex:
    """docs: list of (doc_id, text). Only docs with the field count toward
    docCount/avgdl (Lucene CollectionStatistics.docCount)."""
    doc_ids, norms, lens = [], [], []
    postings: dict[str, list[list]] = {}
    sum_ttf = 0
    for idx, (doc_id, text) in enumerate(docs):
        toks = tokenize_py(text)
        doc_ids.append(doc_id)
        dl = len(toks)
        lens.append(dl)
        sum_ttf += dl
        norms.append(int(lucene.int_to_byte4(dl)) & 0xFF)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, [[], []])
            postings[term][0].append(idx)
            postings[term][1].append(tf)
    return OracleIndex(
        doc_ids=doc_ids,
        norms=np.array(norms, dtype=np.int64),
        doc_lens=np.array(lens, dtype=np.int64),
        postings={
            t: (np.array(d, dtype=np.int64), np.array(f, dtype=np.int64))
            for t, (d, f) in postings.items()
        },
        doc_count=len(doc_ids),
        sum_ttf=sum_ttf,
        quantize=quantize,
    )


def _term_contribs(ix: OracleIndex, term: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, float32 contribution) for one query term; empty if unseen."""
    if term not in ix.postings:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    d, tf = ix.postings[term]
    df = len(d)
    w = lucene.term_weight(df, ix.doc_count)
    if ix.quantize:
        cache = lucene.norm_cache(lucene.avg_field_length(ix.sum_ttf, ix.doc_count))
        contrib = lucene.bm25_contrib(w, tf, ix.norms[d], cache)
    else:
        # unquantized double-precision variant (used by DuckDB-checkable
        # queries where SmallFloat emulation in SQL is not practical)
        avgdl = ix.avgdl
        idf = float(lucene.idf(df, ix.doc_count))
        dl = ix.doc_lens[d].astype(np.float64)
        contrib = (idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))).astype(np.float64)
    return d, contrib


def score_match(
    ix: OracleIndex, query_terms: list[str], operator: str = "or", k: int = 10
) -> list[tuple]:
    """Top-k for a `match` query (reference MatchQuery.scala:26-54 semantics):
    one TermQuery per analyzed token, OR→SHOULD / AND→MUST; duplicate query
    tokens add duplicate SHOULD clauses (scores count twice).

    Returns [(doc_id, float32_score), ...] sorted score desc, docid asc.
    """
    n = ix.doc_count
    acc = np.zeros(n, dtype=np.float64)
    seen = np.zeros(n, dtype=np.int64)
    distinct = list(dict.fromkeys(query_terms))
    for term in query_terms:
        d, c = _term_contribs(ix, term)
        acc[d] += c.astype(np.float64)
    for term in distinct:
        d, _ = _term_contribs(ix, term)
        if len(d):
            seen[d] += 1
    if operator == "and":
        mask = seen == len(distinct)
        # AND over a term absent from the corpus matches nothing
        if any(t not in ix.postings for t in distinct):
            mask[:] = False
    else:
        mask = seen > 0
    idxs = np.nonzero(mask)[0]
    scores = acc[idxs].astype(np.float32) if ix.quantize else acc[idxs]
    order = sorted(range(len(idxs)), key=lambda j: (-scores[j], ix.doc_ids[idxs[j]]))[:k]
    return [(ix.doc_ids[idxs[j]], float(scores[j])) for j in order]
