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
