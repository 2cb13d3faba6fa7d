"""Cross-encoder rerank: fetch-window → render pairs → batch-score → re-sort.

Reference ``api/query/rerank/CEQuery.scala:27-95``: run the retrieve
sub-query for a ``window`` of candidates, render (query, doc-field) pairs,
batch them through a cross-encoder ONNX model, and re-sort by model score.

Spark-native shape (all sizes bounded by ``window``, so every step after the
first-phase retrieval is a tiny-frame operation):

1. first phase — any retrieve query via ``Searcher.search(size=window)``
   (distributed top-k, TakeOrderedAndProject);
2. render — broadcast doc-fetch join pulls the rerank field's stored text;
3. score — ONE Arrow-batched ``mapInPandas`` pass calls the scorer with the
   query and the batch of texts (the model-inference surface: plug an ONNX
   cross-encoder session into ``scorer`` on a real deployment — the batch
   shape is exactly the (query, passage) list such models take);
4. re-sort by (ce_score desc, docid asc), take k.

No ONNX runtime exists in this sandbox, so the DEFAULT scorer is a real,
deterministic lexical proxy (distinct-token overlap / sqrt(len·len) — an
actual reranking signal, not a placebo) which keeps the full pipeline
testable and oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nixiesearch_spark.analysis import analyzer_py


def lexical_overlap_scorer(analyzer: str = "standard"):
    """Deterministic (query, texts)->scores batch scorer:
    |q ∩ d| / sqrt(|q|·|d|) over distinct analyzed tokens (0 when either
    side is empty). Same shape as a cross-encoder predict_batch call."""
    tok = analyzer_py(analyzer)

    def score_batch(query: str, texts) -> list[float]:
        q = set(tok(query))
        out = []
        for t in texts:
            d = set(tok(t) if t is not None else [])
            if not q or not d:
                out.append(0.0)
            else:
                out.append(len(q & d) / (len(q) * len(d)) ** 0.5)
        return out

    return score_batch


def ce_rerank(
    searcher,
    first_phase,
    field: str,
    query_text: str,
    k: int = 10,
    window: int = 100,
    scorer=None,
    keep_first_score: bool = True,
) -> DataFrame:
    """Rerank the ``first_phase`` query's top ``window`` by a batch scorer
    over the stored ``field`` text. Returns (docid, ce_score[, score]) top-k
    ordered by (ce_score desc, docid asc)."""
    score_batch = scorer or lexical_overlap_scorer(
        searcher.reader.field_analyzer(field)
        if field in searcher.reader.stats.get("analyzers", {})
        else "standard"
    )
    cands = searcher.search(first_phase, size=window, fields=[field])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            scores = score_batch(query_text, pdf[field].tolist())
            out = pd.DataFrame(
                {"docid": pdf["docid"], "ce_score": scores, "score": pdf["score"]}
            )
            yield out

    # first-phase score keeps the reader's own type: float (quantized) or
    # double (oracle mode) — a fixed "float" would silently truncate doubles
    scored = cands.mapInPandas(
        run, schema=f"docid long, ce_score double, score {searcher._stype}"
    )
    cols = ["docid", "ce_score"] + (["score"] if keep_first_score else [])
    return (
        scored.select(*cols)
        .orderBy(F.desc("ce_score"), F.asc("docid"))
        .limit(k)
    )
