"""spark-submit job: build an index from a parquet/Iceberg corpus.

    spark-submit --py-files nixiesearch_spark.zip scripts/build_index.py \
        --input /path/corpus.parquet --index /path/index \
        --fields content --shards 128 [--id-col doc_id] [--resume]

On a cluster, point --input at an Iceberg table path or swap
``spark.read.parquet`` for ``spark.read.table``.
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--fields", default="content")
    p.add_argument("--id-col", default=None)
    p.add_argument("--shards", type=int, default=32)
    p.add_argument("--no-quantize", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    from nixiesearch_spark.index import IndexBuilder, IndexConfig

    # get_spark is a no-op config-wise under spark-submit (an existing
    # session wins); run locally it sizes the JVM for the build workload
    # instead of the 1g default heap
    from nixiesearch_spark.session import get_spark

    spark = get_spark("nixiesearch-build")
    df = spark.read.parquet(args.input)
    cfg = IndexConfig(
        text_fields=tuple(args.fields.split(",")),
        id_col=args.id_col,
        n_shards=args.shards,
        quantize=not args.no_quantize,
    )
    stats = IndexBuilder(spark, cfg).build(df, args.index, resume=not args.no_resume)
    print(stats)


if __name__ == "__main__":
    main()
