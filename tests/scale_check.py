"""10x scale spot-run: oracle parity beyond the largest driver SF.

The sf0.1 sweep in round 4 surfaced a real boundary bug that sf0.01
never hit; another 10x of data is the cheapest way to surface the next
one. The driver ships no sf1.0, so this tool SYNTHESIZES one: the
shuffle-heavy tables (events, documents, lineitem) are replicated 10x
with perturbed keys/timestamps/texts (no accidental duplicate texts —
dedup outputs must stay linear), the rest copied through, and the 12
shuffle-heaviest queries with linear-complexity oracles run through
the exact `tests/oracle_check.run` comparator (row count + schema +
order-insensitive value hash vs DuckDB on the SAME parquet).

Usage:  python tests/scale_check.py [workdir]      (default /tmp/sfbig)

Synthetic inputs here do NOT replace the canonical testdata — they
exist purely to stress the engines at a scale the driver's data does
not reach; both engines read the identical files, so parity is as
meaningful as at sf0.01.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))

# 10x tables: key offsets keep every residue class the gates filter on
# (doc_id % 20, event_id % 13 ...) represented identically per replica
SCALED = {
    "events": """
        SELECT event_id + r * 20000020 AS event_id,
               ts + (r * INTERVAL 7 SECOND) AS ts,
               user_id + r * 1000003 AS user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet'), range({n}) t(r)""",
    "documents": """
        SELECT doc_id + r * 20000020 AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' rep' || r::VARCHAR END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars
                    ELSE length(text || ' rep' || r::VARCHAR) END
                 AS n_chars
        FROM read_parquet('{src}/documents.parquet'), range({n}) t(r)""",
    "lineitem": """
        SELECT * REPLACE (l_orderkey + r * 60000000 AS l_orderkey)
        FROM read_parquet('{src}/lineitem.parquet'), range({n}) t(r)""",
}

# shuffle-heaviest queries whose oracles AND result sets stay
# linear-ish. Excluded by necessity, not preference: the dbscan
# oracle is an O(n^2) recursive CTE, and interval_join's OUTPUT is
# quadratic in event density (at 10x the same time range each
# interval overlaps 10x more partners → ~100x rows; 3.6 GiB/task
# exceeded maxResultSize in the collect-based comparator).
QUERIES = [
    "dedup_exact",
    "dedup_minhash_sigs",
    "dedup_simhash",
    "contamination_exact",
    "contamination_bloom_jvm",
    "pack_shards",
    "events_rollup",
    "as_of_join",
    "sessionize",
    "agg_pricing_summary",
    "grid_cell_histogram",
    "sample_weighted_by_source",
    # round-5 late additions, all linear-output
    "vocab_top_k",
    "doc_logprob",
    "bm25_topk",
    "sample_group_split",
]


def synthesize(workdir: str) -> None:
    import duckdb

    os.makedirs(workdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        dst = f"{workdir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        t0 = time.time()
        if t in SCALED:
            sel = SCALED[t].format(src=SRC, n=REPLICAS)
        else:
            sel = f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')"
                        ).fetchone()[0]
        print(f"# synthesized {t}: {n} rows in {time.time()-t0:.1f}s",
              file=sys.stderr)


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    synthesize(workdir)
    import oracle_check
    t0 = time.time()
    rc = oracle_check.run(workdir, only=QUERIES)
    print(f"# scale spot-run over {len(QUERIES)} queries in "
          f"{time.time()-t0:.1f}s rc={rc}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    raise SystemExit(main())
