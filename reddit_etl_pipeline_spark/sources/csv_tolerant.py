"""Tolerant CSV source — Redshift COPY parity.

The reference bulk-loads daily CSVs with a highly tolerant COPY
(reference ``airflow/extraction/s3_to_redshift.py:205-224``):

    IGNOREHEADER 1, DELIMITER ',', CSV, ACCEPTINVCHARS AS ' ',
    EMPTYASNULL, TRUNCATECOLUMNS, MAXERROR 100, ACCEPTANYDATE,
    DATEFORMAT 'auto', TIMEFORMAT 'auto', TRIMBLANKS, BLANKSASNULL

Implementation: one declarative scan that reads every field as a string
(CSV quoting/multi-line handled by the parser — the real fixtures embed
newlines in quoted selftext: 20250320.csv is 2,172 physical lines for 171
records), then applies the engine's own per-column coercion rules as lazy
Column expressions:

- EMPTYASNULL / BLANKSASNULL / TRIMBLANKS -> ``nullif(trim(c), '')``
- TRUNCATECOLUMNS                         -> ``substring(c, 1, width)``
- ACCEPTINVCHARS AS ' '                   -> invalid UTF-8 bytes arrive
  from Spark's decoder as U+FFFD replacement chars; substitute ``' '``
  (Redshift replaces each invalid byte before width truncation)
- ACCEPTANYDATE / TIMEFORMAT 'auto'       -> ``try_cast(timestamp)``,
  unparseable dates load as NULL (Redshift ACCEPTANYDATE semantics)
- numeric fields                          -> ``try_cast``; a non-null raw
  value that fails the cast marks the ROW corrupt (Redshift rejects it
  and counts it toward MAXERROR)

Doing our own error accounting instead of Spark's ``_corrupt_record``
avoids the corrupt-column query restriction, keeps ``count()`` consistent
with materialized rows, and — at scale — stays a single pushdown-friendly
projection over the scan with no caching or second parse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import REDDIT_POSTS_SCHEMA, VARCHAR_WIDTHS

CORRUPT_COL = "_corrupt_record"
#: types whose cast failure rejects the row (Redshift: load error -> MAXERROR)
_REJECTING_TYPES = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType)
#: types whose cast failure loads NULL (Redshift: ACCEPTANYDATE)
_NULLING_TYPES = (T.TimestampType, T.DateType)


def _as_string_schema(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    )


def apply_tolerance(
    raw: DataFrame,
    schema: T.StructType,
    varchar_widths: dict[str, int] | None = None,
    extra_corrupt: Column | None = None,
    accept_invalid_chars: str | None = " ",
) -> DataFrame:
    """Apply the COPY-tolerance coercions to an all-string relation:
    blank->null, invalid-char substitution, width truncation, try_cast
    with per-type reject/null policy. Shared by the CSV and JSONL sources
    — one lazy projection. ``extra_corrupt`` ORs a source-specific reject
    condition (e.g. unparseable JSON) into the corrupt flag.
    ``accept_invalid_chars`` is the ACCEPTINVCHARS replacement (None
    disables; Redshift without the flag would reject such rows)."""
    widths = varchar_widths or {}
    cols: list[Column] = []
    corrupt = extra_corrupt if extra_corrupt is not None else F.lit(False)
    for f in schema.fields:
        # blanks -> null first (so '  ' doesn't fail a numeric cast)
        c = F.nullif(F.trim(F.col(f.name)), F.lit(""))
        if isinstance(f.dataType, T.StringType):
            raw_c = F.col(f.name)  # preserve inner whitespace, only clip width
            if accept_invalid_chars is not None:
                # ACCEPTINVCHARS AS ' ' (s3_to_redshift.py:215): bytes that
                # weren't valid UTF-8 surface as U+FFFD after decode;
                # substitute BEFORE blank-collapse and truncation, like
                # Redshift replaces before loading
                raw_c = F.regexp_replace(
                    raw_c, "\uFFFD", accept_invalid_chars
                )
            c = F.nullif(raw_c, F.lit(""))
            c = F.when(F.trim(c) == "", F.lit(None)).otherwise(c)
            if f.name in widths:
                c = F.substring(c, 1, widths[f.name])
            cols.append(c.alias(f.name))
            continue
        typed = c.try_cast(f.dataType)
        if isinstance(f.dataType, _REJECTING_TYPES):
            corrupt = corrupt | (c.isNotNull() & typed.isNull())
        # _NULLING_TYPES and booleans: failed cast -> null, row accepted
        cols.append(typed.alias(f.name))
    return raw.select(*cols, corrupt.alias(CORRUPT_COL))


def read_tolerant_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    varchar_widths: dict[str, int] | None = None,
) -> DataFrame:
    """Tolerant typed CSV scan. Returns the typed relation plus a boolean
    ``_corrupt_record`` column (True = Redshift would reject the row)."""
    raw = (
        spark.read.schema(_as_string_schema(schema))
        .options(
            header=True,
            multiLine=True,
            quote='"',
            escape='"',
            mode="PERMISSIVE",
            ignoreLeadingWhiteSpace=False,
            ignoreTrailingWhiteSpace=False,
        )
        .csv(path)
    )
    return apply_tolerance(raw, schema, varchar_widths)


def read_posts_csv(
    spark: SparkSession,
    path: str,
    max_error: int = 100,
) -> DataFrame:
    """Load a daily posts CSV the way ``load_data_into_redshift`` does
    (s3_to_redshift.py:334-381): tolerant scan -> MAXERROR audit ->
    clean 16-column relation. The audit is the only eager action; the
    returned relation stays lazy."""
    df = read_tolerant_csv(
        spark, path, REDDIT_POSTS_SCHEMA, varchar_widths=VARCHAR_WIDTHS
    )
    n_corrupt = count_corrupt_records(df)
    if n_corrupt > max_error:
        raise ValueError(
            f"CSV load exceeded MAXERROR={max_error}: "
            f"{n_corrupt} corrupt records in {path}"
        )
    return df.filter(~F.col(CORRUPT_COL)).drop(CORRUPT_COL)


def write_posts_csv(
    df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"
) -> None:
    """CSV sink with header row (reference ``save_to_csv``,
    extract-from-reddit.py:181-197). ``single_file=True`` coalesces to one
    output file for byte-level parity with the reference's daily CSV —
    only sane for batch-sized outputs; distributed multi-file is the
    default. Quoting/escaping mirror the tolerant reader so a write→read
    round-trip is lossless (multi-line selftext included)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .options(
            header=True,
            quote='"',
            escape='"',
            # the CSV WRITER trims field whitespace by default (univocity);
            # keep trailing newlines/spaces so round-trips are lossless
            ignoreLeadingWhiteSpace=False,
            ignoreTrailingWhiteSpace=False,
        )
        .csv(path)
    )


def count_corrupt_records(df: DataFrame) -> int:
    """Rows the tolerant scan would reject (MAXERROR accounting,
    ``check_load_errors`` parity, s3_to_redshift.py:312-331)."""
    row = df.agg(F.sum(F.col(CORRUPT_COL).cast("long")).alias("n")).first()
    return int(row["n"] or 0)


def peek_headers(spark: SparkSession, path: str) -> list[str]:
    """Header inspection (reference test.py:5-32 reads the first 1000 bytes
    of the S3 object; Spark's header read is already metadata-cheap)."""
    return spark.read.option("header", True).csv(path).columns


def inspect_raw_lines(spark: SparkSession, path: str, n: int = 5) -> DataFrame:
    """Raw-line inspect (s3_to_redshift.py:236-282): first ``n`` physical
    lines, unparsed."""
    return spark.read.text(path).limit(n)
