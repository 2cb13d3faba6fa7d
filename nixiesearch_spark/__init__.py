"""nixiesearch_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch re-expression of the lexical text path of the reference engine
(nixiesearch, a Lucene-backed hybrid search engine) in idiomatic PySpark:

- tokenize → posting lists → segment merge → top-k BM25 (Lucene 10.3 default
  BM25Similarity semantics: k1=1.2, b=0.75, 1-byte SmallFloat norm
  quantization, docid-asc tiebreak), cf. reference
  ``api/query/retrieve/RetrieveQuery.scala`` and ``core/field/TextFieldCodec.scala``.
- filters / facets / sorts / RRF as Catalyst-native DataFrame plans,
  cf. reference ``api/filter/Predicate.scala``, ``core/aggregate/*``,
  ``api/query/rerank/RRFQuery.scala``.
- plus large-scale training-data pipeline operators (dedup, ANN similarity,
  text analysis, multimodal plumbing) that the 100 TB use-case needs.

Everything is DataFrame-first; Python touches data only through Arrow-batched
pandas UDFs (posting-list VByte codec, block-max WAND top-k) — never per-row.
"""

__version__ = "0.1.0"

from nixiesearch_spark.session import get_spark  # noqa: F401
