"""Query/document embedding provider — the `semantic` query's model hook.

The reference embeds queries and documents with an ONNX/llama.cpp model
(``api/query/retrieve/SemanticQuery.scala:16-38``; inference out of v1
scope here — no ONNX runtime in the sandbox). This module is the pluggable
point where that inference goes, shipped with a DETERMINISTIC feature-hash
embedder (the hashing trick: token → md5 bucket ± sign, L2-normalized) so
the whole semantic path — embed docs at index time, embed the query text,
cosine knn, RRF fusion — is real, testable, and DuckDB-oracle-able
end-to-end. On a deployment, swap :func:`hash_embed_py` for a model call
(``Searcher(embedder=...)``) and the plumbing is unchanged.

Hash family parity: bucket = first-15-hex-digits-of-md5 as int (the same
60-bit family `pipeline/dedup.py` uses, proven bit-equal between Python
and DuckDB by the minhash oracle), sign from the 16th hex digit. Values
are float64 both sides; the gate compares cosines at round(…, 6).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column

DEFAULT_DIM = 64


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _md5_sign(s: str) -> int:
    return 1 if int(hashlib.md5(s.encode()).hexdigest()[15], 16) >= 8 else -1


def md5_long_sql(expr: str) -> str:
    """DuckDB spelling of :func:`_md5_long` — the single source of truth
    for the 60-bit md5 family's SQL form (dedup + embedding oracles)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash_embed_py(text: str | None, dim: int = DEFAULT_DIM, analyzer: str = "standard") -> list[float]:
    """Deterministic feature-hash embedding of analyzed tokens (float64)."""
    from nixiesearch_spark.analysis import analyzer_py

    tok = analyzer_py(analyzer)
    vec = [0.0] * dim
    for t in tok(text):
        h = hashlib.md5(t.encode()).hexdigest()  # one digest per token
        vec[int(h[:15], 16) % dim] += 1.0 if int(h[15], 16) >= 8 else -1.0
    norm = sum(v * v for v in vec) ** 0.5
    if norm == 0.0:
        return vec
    return [v / norm for v in vec]


def hash_embed_col(col: Column, dim: int = DEFAULT_DIM, analyzer: str = "standard") -> Column:
    """Column form: Arrow-batched pandas_udf running the same python fn —
    embedding inference is THE documented UDF surface (an ONNX session
    would sit exactly here on a real deployment)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def _udf(s: pd.Series) -> pd.Series:
        from nixiesearch_spark.analysis import analyzer_py

        tok = analyzer_py(analyzer)  # resolve once per batch, not per row

        def emb(x):
            vec = [0.0] * dim
            for t in tok(x):
                h = hashlib.md5(t.encode()).hexdigest()
                vec[int(h[:15], 16) % dim] += 1.0 if int(h[15], 16) >= 8 else -1.0
            norm = sum(v * v for v in vec) ** 0.5
            return vec if norm == 0.0 else [v / norm for v in vec]

        return s.map(emb)

    return _udf(col)


def hash_embed_sql(dim: int = DEFAULT_DIM) -> dict[str, str]:
    """DuckDB spellings of the bucket/sign family for the oracle:
    expressions over a token column expression ``{t}`` (format in)."""
    return {
        "bucket": "(" + md5_long_sql("{t}") + " % " + str(dim) + ")",
        "sign": "(CASE WHEN strpos('89abcdef', substr(md5({t}), 16, 1)) > 0 THEN 1.0 ELSE -1.0 END)",
    }
