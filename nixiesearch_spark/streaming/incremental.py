"""Incremental index maintenance via Structured Streaming.

The reference's "streaming" is incremental index upkeep, not stream
analytics (SURVEY.md §2.11): a Kafka poll loop hands batches to the indexer
and commits offsets after indexing (at-least-once,
``source/KafkaSource.scala:29-49,158-177``), with periodic flush
(``config/mapping/IndexConfig.scala:35-44``) and upsert-by-id
(delete-then-add, ``index/Indexer.scala:97-99``).

Spark-native shape:
- any Structured Streaming source (file dir here; swap ``readStream.format
  ("kafka")`` + ``startingOffsets`` on a real deployment — the reference's
  offset-seek modes map 1:1 onto ``startingOffsets``/
  ``startingOffsetsByTimestamp``) feeds ``foreachBatch``;
- each micro-batch appends delta docs + postings tagged with ``seqnum`` =
  batch_id (exactly-once per batch via the streaming checkpoint — stronger
  than the reference's commitAsync);
- ``compact()`` is the flush/merge analog: global last-write-wins upsert by
  (docid, seqnum) and full re-finalize, atomically swapping the index dir.
  Between compactions readers see appended deltas immediately (new Iceberg-
  snapshot-style visibility); a re-ingested _id surfaces twice until the
  next compaction — same at-least-once window the reference documents.
"""

from __future__ import annotations

import glob
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nixiesearch_spark.index.builder import IndexBuilder, IndexConfig


@dataclass
class MergePolicy:
    """Auto-compaction trigger for incremental appends — the analog of the
    reference's merge policies (``config/mapping/MergePolicyConfig.scala:
    19-124``: No/LogByteSize/LogDoc/Tiered). Every append batch adds small
    postings files; unmerged they degrade query scans. ``tiered`` merges when
    the postings file count exceeds ``segments_per_tier`` × the post-merge
    baseline (merge() rewrites to ≈1 file per shard), mirroring Lucene's
    TieredMergePolicy size-ratio trigger at the file-count level where
    parquet layout decides scan cost. ``kind="none"`` = manual merge only."""

    kind: str = "tiered"  # "none" | "tiered"
    segments_per_tier: int = 4  # allowed file-count multiple of the baseline
    min_files: int = 8  # never trigger below this many files

    def should_merge(self, n_files: int, n_shards: int) -> bool:
        if self.kind == "none":
            return False
        return n_files >= max(self.min_files, self.segments_per_tier * n_shards)


class IncrementalIndexer:
    def __init__(
        self,
        spark: SparkSession,
        config: IndexConfig,
        index_dir: str,
        merge_policy: MergePolicy | None = None,
        pack_each_batch: bool = True,
    ):
        """``pack_each_batch=False`` is the heavy-streaming mode: packing
        rewrites the whole packed table, so deferring it to the merge-policy
        compaction keeps per-batch cost proportional to the batch. The flat
        serving path stays fresh every batch; WAND refuses the stale packed
        table until the next merge (builder.finalize docstring)."""
        self.spark = spark
        self.config = config
        self.index_dir = index_dir
        self.builder = IndexBuilder(spark, config)
        self.merge_policy = merge_policy or MergePolicy(kind="none")
        self.pack_each_batch = pack_each_batch

    # ---------- micro-batch sink ----------

    def _postings_file_count(self) -> int:
        return len(
            glob.glob(os.path.join(self.index_dir, "postings", "**", "*.parquet"),
                      recursive=True)
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: append this batch's docs + postings delta with
        seqnum=batch_id, then refresh derived tables (stats/dictionary/packed).
        A merge policy may then fold the accumulated small files
        (commit-then-compact, like the reference's flush + merge scheduling).
        """
        if batch_df.isEmpty():
            return
        tagged = batch_df.withColumn("seqnum", F.lit(int(batch_id)))
        self.builder._build_shards(tagged, self.index_dir, list(range(self.config.n_shards)))
        self.builder.finalize(self.index_dir, pack=self.pack_each_batch)
        if self.merge_policy.should_merge(self._postings_file_count(), self.config.n_shards):
            self.builder.merge(self.index_dir)  # merge() re-finalizes with pack

    def start_file_stream(self, input_dir: str, schema, checkpoint_dir: str):
        """availableNow file-source stream → foreachBatch index appends.
        Returns the StreamingQuery; call ``.awaitTermination()``."""
        stream = (
            self.spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(input_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def delete_ids(self, docids: list[int]) -> None:
        """Mark documents deleted (tombstones); they vanish from results
        immediately (Searcher anti-joins tombstones) and are physically
        removed at the next compact() — the delete-by-_id analog of
        reference ``index/Indexer.scala:97-99`` / IndexModifyRoute."""
        df = self.spark.createDataFrame([(int(d),) for d in docids], "docid long")
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.index_dir, "tombstones")
        )

    # ---------- compaction / upsert ----------

    def compact(self) -> None:
        """Last-write-wins upsert by _id then full rebuild, atomic dir swap
        (the merge/flush analog; reference Indexer.scala:97-99,148-164)."""
        from pyspark.sql import Window

        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        tomb_path = os.path.join(self.index_dir, "tombstones")
        if os.path.isdir(tomb_path):
            tombs = self.spark.read.parquet(tomb_path)
            docs = docs.join(tombs, "docid", "left_anti")
        seq = F.col("seqnum") if "seqnum" in docs.columns else F.lit(0)
        w = Window.partitionBy("docid").orderBy(F.desc(seq))
        stored = [
            c
            for c in docs.columns
            if c not in ("docid", "shard", "sha256", "ordinal")
            and not c.startswith(("doclen_", "norm_"))
        ]
        latest = (
            docs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*stored)
        )
        tmp = self.index_dir + ".compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        self.builder.build(latest, tmp, resume=False)
        old = self.index_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.index_dir, old)
        os.rename(tmp, self.index_dir)
        shutil.rmtree(old, ignore_errors=True)
