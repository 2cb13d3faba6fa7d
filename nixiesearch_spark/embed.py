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


def hash_embed_py(text: str | None, dim: int = DEFAULT_DIM, analyzer: str = "standard") -> list[float]:
    """Deterministic feature-hash embedding of analyzed tokens (float64)."""
    from nixiesearch_spark.analysis import analyzer_py

    vec = [0.0] * dim
    for t in analyzer_py(analyzer)(text):
        vec[_md5_long(t) % dim] += float(_md5_sign(t))
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
        return s.map(lambda x: hash_embed_py(x, dim, analyzer))

    return _udf(col)


def hash_embed_sql(dim: int = DEFAULT_DIM) -> dict[str, str]:
    """DuckDB spellings of the bucket/sign family for the oracle:
    expressions over a token column expression ``{t}`` (format in)."""
    return {
        "bucket": "(CAST(concat('0x', substr(md5({t}), 1, 15)) AS BIGINT) % " + str(dim) + ")",
        "sign": "(CASE WHEN strpos('89abcdef', substr(md5({t}), 16, 1)) > 0 THEN 1.0 ELSE -1.0 END)",
    }
