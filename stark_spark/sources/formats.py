"""Interchange-format sources/sinks: JSONL, CSV, ORC.

Training-data pipelines rarely get parquet at the front door — raw
corpora arrive as JSONL (the de-facto LLM-corpus interchange format),
CSV exports, or ORC from legacy Hive estates. These helpers are thin,
deliberately: Spark's native readers already do distributed decode,
schema enforcement, predicate pushdown (ORC), and splittable
compression; the value here is pinning the OPTIONS that make the
roundtrip byte-faithful (JSON/CSV readers are lossy by default —
permissive parse modes silently null out bad rows, CSV needs explicit
quoting/escaping discipline) and keeping an explicit schema mandatory
so a 1000-file ingest can't drift types mid-read.

Every reader takes an explicit schema: schema inference reads data
twice and infers per-file at scale — the classic source of
whole-pipeline type flaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(df: DataFrame, path: str, *, n_files: int = 4) -> None:
    """Write as JSON-lines (one object per line, UTF-8) — splittable,
    append-friendly, the LLM-corpus interchange default."""
    df.repartition(n_files).write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """FAILFAST: a malformed line is an error, not a silent NULL row
    (the default PERMISSIVE mode is how corrupt shards sneak into a
    training mix)."""
    return (spark.read.schema(schema).option("mode", "FAILFAST")
            .json(path))


def write_csv(df: DataFrame, path: str, *, n_files: int = 4) -> None:
    """Quoted CSV with escaped quotes and explicit empty/null markers
    — the combination that survives free text with embedded
    delimiters/newlines in the value columns.

    HONEST LIMIT (inherent to CSV, not this wrapper): a literal text
    value equal to the null marker ``\\N`` is indistinguishable from
    NULL on the wire — Spark's writer emits both as the same bytes
    even under quoteAll, and the reader maps both back to NULL.
    Corpora that may legitimately contain the marker string belong in
    JSONL or ORC (both round-trip losslessly, see tests)."""
    # emptyValue is the QUOTED empty ('""') on the write side: the
    # Univocity reader maps an unquoted empty field to null and a
    # quoted one to the empty string — this asymmetric pair is what
    # lets '' and NULL survive the roundtrip as distinct values
    # the writer TRIMS cell whitespace by default (ignore*WhiteSpace
    # default true on write, unlike read) — disable both explicitly
    (df.repartition(n_files).write.mode("overwrite")
       .option("header", "true").option("quote", '"')
       .option("escape", '"').option("emptyValue", '""')
       .option("nullValue", "\\N")
       .option("ignoreLeadingWhiteSpace", "false")
       .option("ignoreTrailingWhiteSpace", "false")
       .csv(path))


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return (spark.read.schema(schema)
            .option("header", "true").option("quote", '"')
            .option("escape", '"').option("emptyValue", "")
            .option("nullValue", "\\N")
            .option("mode", "FAILFAST").option("multiLine", "true")
            .csv(path))


def write_orc(df: DataFrame, path: str, *, n_files: int = 4) -> None:
    df.repartition(n_files).write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC carries its own schema and min/max stripe stats — filters
    push down like parquet's, so no explicit schema needed."""
    return spark.read.orc(path)


def write_date_partitioned(df: DataFrame, path: str, *,
                           ts_col: str = "ts",
                           part_col: str = "event_date",
                           n_files_per_day: int = 2) -> None:
    """Hive-partitioned event-time layout (``.../event_date=D/``) —
    the canonical 100 TB event-store layout: a date predicate prunes
    whole DIRECTORIES before any file is opened, time-ordered ingest
    appends new partitions without touching old ones, and retention
    is a directory drop. ``repartition(date)`` keeps each day's rows
    in few files (the small-files problem is the other half of this
    layout's discipline)."""
    from pyspark.sql import functions as F
    out = df.withColumn(part_col, F.to_date(F.col(ts_col)))
    (out.repartition(n_files_per_day, F.col(part_col))
        .write.mode("overwrite").partitionBy(part_col).parquet(path))


def read_date_partitioned(spark: SparkSession, path: str, *,
                          start: str, end: str,
                          part_col: str = "event_date") -> DataFrame:
    """Read back with an inclusive date-range predicate that Spark
    resolves at PLANNING time against the directory names
    (PartitionFilters — asserted in tests/test_sources). The
    partition column comes back as DATE."""
    from pyspark.sql import functions as F
    return (spark.read.parquet(path)
            .where((F.col(part_col) >= F.lit(start).cast("date"))
                   & (F.col(part_col) <= F.lit(end).cast("date"))))
