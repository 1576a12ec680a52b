"""File-based JSONL ingest with a malformed-record side channel — the
source-level twin of the P1 malformed-EMF filter (operators/parse.py
splits records the PARSER rejects; this splits lines the JSON READER
rejects), and the migration path for fluentd/fluent-bit file tails
(reference: fluent-bit-emf/main.go FLBPluginFlushCtx consumes decoded
msgpack — a JSONL tail is the same stream before the forwarder).

Design: lines come in through the TEXT source and parse via
``from_json`` with an explicit corrupt-record field. Parsing as an
EXPRESSION (not the JSON file reader's internal corrupt column) matters
twice over:

- Spark disallows plans whose only reference into a raw JSON scan is
  the internal corrupt column (SPARK-26108 guard) — the errors branch
  is exactly that query, so the json() reader needs a cache/save
  workaround; the text+from_json form has no such restriction and the
  same expression serves batch and streaming unchanged.
- The raw line survives VERBATIM in its own column, so a quarantine
  sink can replay it after a schema fix — the malformed side-output
  contract of the reference pipeline (plugin.go drops with a counter;
  we keep the evidence).

Two readers:

- ``read_jsonl(spark, path)`` — batch; infers the schema from the data
  when none is given (one extra pass at scale — pass the schema in
  production).
- ``read_jsonl_stream(spark, path, schema)`` — streaming; Structured
  Streaming file sources REQUIRE a schema, so there is no inferring
  variant to mis-reach for.

Both return (valid, errors). Blank lines are malformed by this
contract (they are not JSON documents); the text source never emits a
record for the file's trailing newline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [
        StructField(CORRUPT_COL, StringType(), True)
    ])


def _split(lines: DataFrame, schema: StructType) -> tuple[DataFrame, DataFrame]:
    full = _with_corrupt(schema)
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.from_json(
            "value", full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_j"),
    )
    bad = F.col(f"_j.{CORRUPT_COL}").isNotNull() | F.col("_j").isNull()
    valid = parsed.filter(~bad).select("_j.*").drop(CORRUPT_COL)
    errors = parsed.filter(bad).select(
        "raw", F.lit("malformed_json").alias("reason")
    )
    return valid, errors


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Batch JSONL read -> (valid, errors). ``errors`` rows are
    (raw: the line exactly as read, reason: 'malformed_json')."""
    if schema is None:
        inferred = spark.read.json(path).schema
        # inference surfaces the corrupt column when the file already
        # contains broken lines; strip it — _split re-declares it
        schema = StructType(
            [f for f in inferred.fields if f.name != CORRUPT_COL]
        )
        if not schema.fields:
            raise ValueError(
                f"could not infer any data columns from {path} — every "
                f"line is malformed, or the file is empty; pass a schema"
            )
    return _split(spark.read.text(path), schema)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Streaming JSONL source -> (valid, errors) streaming frames; the
    caller attaches sinks (e.g. valid into the pipeline, errors into a
    quarantine dir — both inherit exactly-once from the checkpoint)."""
    lines = (
        spark.readStream
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    return _split(lines, schema)
