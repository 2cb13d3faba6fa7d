from nixiesearch_spark.sources.files import read_docs, mapping_schema  # noqa: F401
