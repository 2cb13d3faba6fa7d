from nixiesearch_spark.streaming.incremental import IncrementalIndexer, MergePolicy  # noqa: F401
