"""Local mirror of the driver's DuckDB oracle gate.

Runs every `__spark_entry__.queries()` entry at sf0.01 next to its
`oracle_sql()` SQL in DuckDB and compares: row count, column-name set,
and an order-insensitive value hash (strict: floats compared bit-ish
via %.17g — if we pass this, any saner comparator passes too).

Usage: python tests/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NaN"
        s = "%.17g" % v
        # Distinguish float 2040.0 from int 2040: the driver's comparator
        # does (round 1 lesson: DuckDB sum(BIGINT) -> HUGEINT -> pandas
        # float64 hash-failed 4 queries that this mirror passed).
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> tuple[int, tuple, str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = ["\t".join(_canon_cell(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(pdf), tuple(cols), h


# --- chunked comparator (quadratic-output queries at scale) ----------------
#
# The default comparator collects both full result sets; a 10x
# interval_join materializes ~3.6 GiB and breaks maxResultSize. The
# chunked path never holds a full result anywhere: each row's
# canonical string (same _canon_cell rules) is sha256'd and the
# 128-bit truncations are summed — a COMMUTATIVE accumulation, so
# Spark can reduce it per Arrow batch in the executors (mapInPandas
# runs this very module's canonicalization — bit-identical rules)
# and DuckDB streams record-batch chunks through the same function.

_MASK128 = (1 << 128) - 1


def _rows_digest(pdf: pd.DataFrame, cols: list[str]) -> tuple[int, int]:
    tot = 0
    n = 0
    for row in pdf[cols].itertuples(index=False, name=None):
        s = "\t".join(_canon_cell(v) for v in row)
        tot = (tot + int.from_bytes(
            hashlib.sha256(s.encode()).digest()[:16], "big")) & _MASK128
        n += 1
    return n, tot


def spark_chunked_hash(df) -> tuple[int, tuple, str]:
    """Distributed commutative frame hash: executors canonicalize and
    digest their own Arrow batches; the driver sums |partitions|
    partials. No full collect at any point."""
    cols = sorted(df.columns)

    # the executor cannot import tests/oracle_check — ship this
    # module's functions by VALUE so the canonicalization rules in
    # the closure are literally these ones
    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    def digest(batches):
        tot = 0
        n = 0
        for pdf in batches:
            bn, bt = _rows_digest(pdf, cols)
            n += bn
            tot = (tot + bt) & _MASK128
        yield pd.DataFrame({"n": [n], "h": [f"{tot:032x}"]})

    parts = df.mapInPandas(digest, "n long, h string").collect()
    n = sum(r.n for r in parts)
    tot = sum(int(r.h, 16) for r in parts) & _MASK128
    return n, tuple(cols), f"{tot:032x}"


def duck_chunked_hash(cur) -> tuple[int, tuple, str]:
    """Streaming commutative frame hash over a DuckDB result cursor."""
    first = cur.fetch_df_chunk()
    cols = sorted(first.columns)
    n = 0
    tot = 0
    pdf = first
    while pdf is not None and len(pdf):
        bn, bt = _rows_digest(pdf, cols)
        n += bn
        tot = (tot + bt) & _MASK128
        pdf = cur.fetch_df_chunk()
    return n, tuple(cols), f"{tot:032x}"


def run(sf_dir: str, only: list[str] | None = None,
        chunked: set[str] | None = None) -> int:
    import __spark_entry__ as entry
    from stark_spark import get_session

    spark = get_session("oracle-check", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if chunked and name in chunked:
            # never collect the full result on either side
            try:
                sn, sc, sh = spark_chunked_hash(fn(spark, sf_dir))
            except Exception as e:
                print(f"FAIL {name}: spark error: {str(e)[:200]}")
                failures += 1
                continue
            try:
                dn, dc, dh = duck_chunked_hash(con.execute(oracles[name]))
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
                failures += 1
                continue
            if (sn, sc, sh) == (dn, dc, dh):
                print(f"PASS {name}: {sn} rows chunked-hash={sh[:12]}")
            else:
                print(f"FAIL {name}: chunked mismatch "
                      f"rows {sn}/{dn} cols {sc}/{dc} hash {sh[:12]}/"
                      f"{dh[:12]}")
                failures += 1
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"PASS(rows-only) {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        sn, sc, sh = frame_hash(spark_pdf)
        dn, dc, dh = frame_hash(duck_pdf)
        if sn != dn:
            print(f"FAIL {name}: rows {sn} vs {dn}")
            failures += 1
        elif sc != dc:
            print(f"FAIL {name}: cols {sc} vs {dc}")
            failures += 1
        elif sh != dh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            # show a tiny diff for debugging
            a = spark_pdf[sorted(spark_pdf.columns)].copy()
            b = duck_pdf[sorted(duck_pdf.columns)].copy()
            for c in a.columns:
                a[c] = a[c].map(_canon_cell)
                b[c] = b[c].map(_canon_cell)
            am = {tuple(r) for r in a.itertuples(index=False, name=None)}
            bm = {tuple(r) for r in b.itertuples(index=False, name=None)}
            print("  only-spark:", list(am - bm)[:3])
            print("  only-duck :", list(bm - am)[:3])
            failures += 1
        else:
            print(f"PASS {name}: {sn} rows hash={sh[:12]}")
    spark.stop()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    sys.exit(1 if run(sf, only) else 0)
