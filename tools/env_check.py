#!/usr/bin/env python
"""Round-start environment sanity check (<5 s, no Spark session).

The round-3 gate lost 8 queries because the driver regenerated
events.parquet with a different ts type between rounds.  This tool
makes that class of drift LOUD at round start: it diffs every testdata
table's arrow schema against the expectations the repo codes to, and
flags anything the loaders would have to adapt to.

Usage: python tools/env_check.py [testdata_root]
Exit 0 = environment matches expectations; 1 = drift found (fix the
loaders/queries before trusting any other signal).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
SFS = ["sf0.001", "sf0.01", "sf0.1"]

# column -> set of acceptable arrow type strings (loaders normalize
# within these; anything OUTSIDE the set needs new loader work)
EXPECTED: dict[str, dict[str, set[str]]] = {
    "events": {
        "event_id": {"int64"}, "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"}, "props": {"string", "large_string"},
        # both known vintages; a third vintage must fail loudly
        "ts": {"int64", "timestamp[us]", "timestamp[ns]"},
    },
    "documents": {
        "doc_id": {"int64"}, "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"}, "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32", "int64"},
    },
    "lineitem": {"l_orderkey": {"int64"}, "l_quantity": {"int64", "double"},
                 "l_extendedprice": {"double"}, "l_discount": {"double"},
                 "l_returnflag": {"string", "large_string"}},
    "orders": {"o_orderkey": {"int64"}, "o_custkey": {"int64"}},
    "customer": {"c_custkey": {"int64"}, "c_nationkey": {"int32", "int64"}},
    "supplier": {"s_suppkey": {"int64"}},
    "part": {"p_partkey": {"int64"}},
    "nation": {"n_nationkey": {"int32", "int64"},
               "n_regionkey": {"int32", "int64"}},
    "region": {"r_regionkey": {"int32", "int64"}},
}

REFERENCE_FILES = [
    "/root/reference/test/data/experiment1.xml",
    "/root/reference/test/data/experiment2.xml",
]


def main() -> int:
    problems: list[str] = []
    for sf in SFS:
        d = os.path.join(ROOT, sf)
        if not os.path.isdir(d):
            problems.append(f"MISSING DIR {d}")
            continue
        for table, cols in EXPECTED.items():
            path = os.path.join(d, f"{table}.parquet")
            if not os.path.exists(path):
                problems.append(f"MISSING {path}")
                continue
            schema = pq.read_schema(path)
            names = set(schema.names)
            for col, ok_types in cols.items():
                if col not in names:
                    problems.append(f"{sf}/{table}: column {col} GONE")
                    continue
                t = str(schema.field(col).type)
                if t not in ok_types:
                    problems.append(
                        f"{sf}/{table}.{col}: type {t} not in {ok_types}")
            meta = pq.ParquetFile(path)
            if meta.metadata.num_rows == 0:
                problems.append(f"{sf}/{table}: ZERO rows")
    for f in REFERENCE_FILES:
        if not os.path.exists(f):
            problems.append(f"MISSING reference file {f}")
    # events ts vintage report (informational even when green)
    for sf in SFS:
        p = os.path.join(ROOT, sf, "events.parquet")
        if os.path.exists(p):
            print(f"{sf}: events.ts = {pq.read_schema(p).field('ts').type}")
    # BPE golden fixtures must match the CURRENT documents corpus: the
    # oracle selects golden rows by (corpus_rows, corpus_chars), so a
    # regenerated corpus makes the oracle return 0 rows -> a silent
    # driver-red.  Regenerate with tools/make_bpe_fixture.py.
    golden = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "bpe_train_golden.parquet")
    if os.path.exists(golden):
        import duckdb

        keys = {tuple(r) for r in duckdb.sql(
            f"SELECT DISTINCT corpus_rows, corpus_chars FROM '{golden}'"
        ).fetchall()}
        for sf in SFS:
            p = os.path.join(ROOT, sf, "documents.parquet")
            if not os.path.exists(p):
                continue
            got = duckdb.sql(
                f"SELECT COUNT(*), CAST(SUM(length(text)) AS BIGINT) "
                f"FROM '{p}'").fetchall()[0]
            if tuple(got) not in keys:
                problems.append(
                    f"{sf}/documents: corpus key {got} absent from BPE "
                    "goldens — run tools/make_bpe_fixture.py")
    if problems:
        print("\nENVIRONMENT DRIFT DETECTED:")
        for p in problems:
            print(" -", p)
        return 1
    print("environment OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
