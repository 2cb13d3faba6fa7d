from nixiesearch_spark.streaming.incremental import IncrementalIndexer  # noqa: F401
