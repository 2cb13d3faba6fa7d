from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig, IndexReader  # noqa: F401
