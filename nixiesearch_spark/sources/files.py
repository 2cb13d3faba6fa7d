"""Document sources: schema-driven JSON/NDJSON/parquet ingestion.

Reference parity (``source/FileSource.scala``, ``core/JsonDocumentStream.scala
:31-92``, ``core/DocumentDecoder.scala:14-63``):

- NDJSON and JSON-array files; gzip/bzip2 transparently (Spark decodes by
  file extension — the reference sniffs magic bytes; same formats covered).
- schema-driven decode: unknown JSON fields are skipped because an explicit
  schema is supplied; type mismatches land in a corrupt-record column
  instead of failing the job (reference rejects malformed docs per-row).
- ONE level of nesting flattened to dot-notation columns
  (``decodeNestedObject``: ``{"a": {"b": 1}}`` → column ``a.b``); nested
  arrays of objects collect into repeated ``parent.child`` list fields
  (``decodeNestedArray``). More than one dot is a mapping error
  (``config/mapping/FieldName.scala:89-93``).
- s3://... paths work unchanged on a cluster with the hadoop-aws jars; the
  URL dispatch the reference hand-rolls is Hadoop FileSystem's job here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nixiesearch_spark.mapping import IndexMapping, MappingError

_SIMPLE = {
    "text": T.StringType(), "id": T.StringType(), "int": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
    "bool": T.BooleanType(), "date": T.DateType(), "datetime": T.TimestampType(),
    "geopoint": T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
    ),
}


def _spark_type(tag: str) -> T.DataType:
    if tag.endswith("[]"):
        return T.ArrayType(_SIMPLE[tag[:-2]])
    return _SIMPLE[tag]


def mapping_schema(mapping: IndexMapping, corrupt_col: str | None = "_corrupt") -> T.StructType:
    """StructType for the raw JSON shape: dotted field names become one
    level of struct nesting (re-flattened after read)."""
    top: dict[str, object] = {}
    for name, f in mapping.fields.items():
        if f.is_wildcard:
            continue
        if name.count(".") > 1:
            raise MappingError(f"field {name!r}: only one nesting level allowed")
        if "." in name:
            parent, child = name.split(".")
            top.setdefault(parent, {})
            if not isinstance(top[parent], dict):
                raise MappingError(f"field {parent!r} is both scalar and object")
            top[parent][child] = f.type
        else:
            top.setdefault(name, f.type)
    fields = []
    for name, spec in top.items():
        if isinstance(spec, dict):
            child_struct = T.StructType(
                [T.StructField(c, _spark_type(t if not t.endswith("[]") else t[:-2]))
                 for c, t in spec.items()]
            )
            # nested arrays of objects → array<struct>; nested object → struct.
            # If any child type is declared repeated, read parent as array.
            repeated = any(t.endswith("[]") for t in spec.values())
            fields.append(
                T.StructField(name, T.ArrayType(child_struct) if repeated else child_struct)
            )
        else:
            fields.append(T.StructField(name, _spark_type(spec)))
    if corrupt_col:
        fields.append(T.StructField(corrupt_col, T.StringType()))
    return T.StructType(fields)


def _flatten(df: DataFrame, mapping: IndexMapping, corrupt_col: str) -> DataFrame:
    cols = []
    done = set()
    for name, f in mapping.fields.items():
        if f.is_wildcard or name in done:
            continue
        if "." in name:
            parent, child = name.split(".")
            src = df.schema[parent].dataType if parent in df.columns else None
            if isinstance(src, T.ArrayType):
                # repeated parent.child list field (decodeNestedArray)
                cols.append(F.col(parent).getField(child).alias(name))
            elif src is not None:
                cols.append(F.col(f"{parent}.{child}").alias(name))
        elif name in df.columns:
            cols.append(F.col(name))
        done.add(name)
    if corrupt_col in df.columns:
        cols.append(F.col(corrupt_col))
    return df.select(*cols)


def read_docs(
    spark: SparkSession,
    path: str,
    mapping: IndexMapping,
    format: str = "auto",  # auto | ndjson | json_array | parquet
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """Read documents per the mapping; malformed rows carry ``corrupt_col``
    non-null instead of failing (PERMISSIVE mode)."""
    if format == "auto":
        p = path.lower()
        if p.endswith((".parquet", ".pq")) or p.rstrip("/").endswith("parquet"):
            format = "parquet"
        else:
            format = "ndjson"
    if format == "parquet":
        return spark.read.parquet(path)
    schema = mapping_schema(mapping, corrupt_col)
    if path.lower().endswith((".zst", ".zstd")) and format == "ndjson":
        # Spark's text/json sources don't decode zstd; the reference sniffs
        # and decompresses it (JsonDocumentStream.scala:31-92). Route through
        # binaryFile + an Arrow-batched decompress+parse pass.
        return _read_ndjson_zstd(spark, path, mapping, schema, corrupt_col)
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if format == "json_array":
        reader = reader.option("multiLine", "true")
    df = reader.json(path)
    return _flatten(df, mapping, corrupt_col)


def _read_ndjson_zstd(spark, path, mapping, schema, corrupt_col) -> DataFrame:
    """zstd NDJSON: binaryFile source → mapInPandas (pyarrow zstd codec) →
    one JSON-lines string per file → from_json per line. Parallelism is
    per-file (same as any non-splittable codec, gzip included)."""
    import pandas as pd
    import pyarrow as pa

    from pyspark.sql import functions as F

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def decomp(batches):
        for pdf in batches:
            lines = []
            for blob in pdf["content"]:
                stream = pa.input_stream(pa.BufferReader(bytes(blob)), compression="zstd")
                text = stream.read()
                lines.extend(text.decode("utf-8", errors="replace").splitlines())
            yield pd.DataFrame({"line": [l for l in lines if l.strip()]})

    lines = raw.mapInPandas(decomp, schema="line string")
    parsed = lines.select(
        F.from_json(
            F.col("line"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("doc"),
        F.col("line"),
    )
    # from_json leaves the corrupt column inside the struct when parse fails
    df = parsed.select("doc.*", "line")
    df = df.withColumn(
        corrupt_col, F.when(F.col(corrupt_col).isNotNull(), F.col("line"))
    ).drop("line")
    return _flatten(df, mapping, corrupt_col)
