"""Tolerant JSON-lines source/sink.

Same coercion contract as the CSV source (csv_tolerant.apply_tolerance):
every field is scanned as a string, then blank->null, width truncation and
try_cast with the reject/null policy run as one lazy projection. Rows that
are not valid JSON at all surface through Spark's PERMISSIVE
``_corrupt_record`` and are counted as rejects too.

JSONL is the interchange format most LLM-data pipelines speak; at scale
prefer parquet for storage and keep JSONL at the edges (this module IS
that edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .csv_tolerant import CORRUPT_COL, _as_string_schema, apply_tolerance


def read_tolerant_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    varchar_widths: dict[str, int] | None = None,
) -> DataFrame:
    """Tolerant typed JSONL scan: typed relation + boolean
    ``_corrupt_record`` (True = row rejected: unparseable JSON or a
    failed numeric cast)."""
    raw_schema = _as_string_schema(schema).add("__bad_json", T.StringType())
    raw = (
        spark.read.schema(raw_schema)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord="__bad_json")
        .json(path)
    )
    # a plan may not reference ONLY the corrupt column of a raw JSON scan;
    # folding it into the same projection as the data columns is fine
    return apply_tolerance(
        raw, schema, varchar_widths, extra_corrupt=F.col("__bad_json").isNotNull()
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (one JSON object per line, snappy-free text for
    interchange)."""
    df.write.mode(mode).json(path)
