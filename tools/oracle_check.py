#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every entry of ``__spark_entry__.queries()`` against its
``oracle_sql()`` DuckDB counterpart on the same parquet tables and
compares row count, column names/types, and an order-insensitive exact
value comparison.  Floats are compared bit-exactly first; near-misses
(<=1e-9 rel) are reported separately so risk is visible before the
driver runs.

Usage: python tools/oracle_check.py [--plain-session] [--lenient-floats]
                                    [--hash-threshold=N] [--no-hash]
                                    [--rows-only]
                                    [sf_dir] [query ...]

Results above ``--hash-threshold`` rows (default 2,000,000) are compared
via the order-insensitive multiset digest in
``hpctoolkit_dataframe_spark/oracle_hash.py`` instead of collecting:
Spark folds per-partition digests with mapInArrow (no row reaches the
driver), DuckDB streams Arrow batches, and both sides share one
canonicalizer so the compare stays value-exact.  This is what lets the
100x-clone sweep attest ~62M-row CCT results that ``collect()`` cannot
hold.  ``--no-hash`` forces the legacy collect path for every size.

``--rows-only`` skips the DuckDB compare for the named queries and
records a SKIP after executing the Spark side end-to-end — for entries
whose ORACLE is declared infeasible at the probed scale (e.g.
semantic_decontaminate's SQL twin is an inherently quadratic 3.5e9-pair
crossJoin at the 100x clone, while the Spark GEMM side runs in ~150 s).
Use sparingly and say why in the sweep notes; a rows-only row is a
weaker attestation and the artifacts must show which rows are weak.

``--plain-session`` builds a DEFAULT SparkSession (no UTC tz, no
nanosAsLong, no Arrow, no AQE tuning) — the driver's gate runs under
exactly such a session, and round 5's two red rows were a
session-config-dependent bug (NaN->NULL fidelity) that the repo's
tuned ``get_spark`` session masked.  Queries must pass under BOTH.

Near-miss floats (<=1e-9 rel drift) FAIL by default — the driver
hashes exact values, so a near-miss here is a red row there.
``--lenient-floats`` restores the old WARN behavior for exploratory
runs.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(None if v is None else v for v in row))
    return sorted(out, key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))


def approx_equal(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return False


def main():
    argv = sys.argv[1:]
    plain = "--plain-session" in argv
    lenient = "--lenient-floats" in argv
    rows_only = "--rows-only" in argv
    sampled: set[str] = set()
    hash_threshold = 2_000_000
    for a in argv:
        if a.startswith("--hash-threshold="):
            hash_threshold = int(a.split("=", 1)[1])
        elif a.startswith("--sampled="):
            # use the SAMPLED oracle twin (queries/sampled.py) for the
            # named entries: deterministic probe-dimension subset,
            # full value compare on the sampled result — for oracles
            # whose whole-result SQL is super-linear at the probed
            # scale.  Unknown names are a hard error.
            sampled = set(a.split("=", 1)[1].split(","))
    if "--no-hash" in argv:
        hash_threshold = 0
    argv = [a for a in argv if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    if plain:
        # the driver's gate session: defaults only (no UTC tz, no
        # nanosAsLong, no Arrow, stock shuffle partitions) — any query
        # whose result depends on a get_spark conf is a latent driver-red
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").appName(
            "oracle-check-plain").getOrCreate()
    else:
        from hpctoolkit_dataframe_spark import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    # explicit spill location (env-overridable): the default is a
    # cwd-relative .tmp, which in the r8 100x sweep sat on the same
    # volume as 30 GB of live Spark shuffle files and hit ENOSPC
    # (cct_hot_regions); pointing it at a chosen dir makes the spill
    # placement a deliberate decision rather than a cwd accident
    tmpdir = os.environ.get("DUCKDB_TEMP_DIR", "/tmp/duckdb_spill")
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    # spill/memory budgets (VERDICT r9 #8): the r9 skew-100x funnel
    # oracle spilled until the VOLUME was full, killing the whole sweep
    # (and any co-located Spark shuffle files).  Cap the spill so a
    # runaway oracle fails ITS row with a clean out-of-temp error
    # instead of taking the box down; cap memory so DuckDB spills
    # predictably instead of fighting the JVM for the last GiB.
    max_spill = os.environ.get("DUCKDB_MAX_TEMP_SIZE", "40GiB")
    if max_spill.lower() not in ("", "none", "off"):
        con.execute(f"SET max_temp_directory_size='{max_spill}'")
    mem_limit = os.environ.get("DUCKDB_MEMORY_LIMIT", "")
    if mem_limit:
        con.execute(f"SET memory_limit='{mem_limit}'")
    for t in TABLES:
        # a table may be a single parquet FILE (the driver's testdata)
        # or a multi-file DIRECTORY (tools/make_scale_data.py output —
        # the splittable production shape); DuckDB needs the glob form
        # for directories
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if sampled:
        from hpctoolkit_dataframe_spark.queries.sampled import SAMPLED

        unknown = sampled - set(SAMPLED)
        if unknown:
            print(f"FATAL: no SAMPLED twin for {sorted(unknown)}")
            sys.exit(2)
        for n in sampled:
            queries[n] = SAMPLED[n].fn
            oracles[n] = SAMPLED[n].sql
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        tag = " [sampled twin]" if name in sampled else ""
        t0 = time.time()
        sql = oracles.get(name)
        if rows_only or sql is None:
            # no DuckDB compare will happen — run the Spark side
            # end-to-end exactly ONCE (a count; no limit probe, no
            # second execution — ADVICE r8: the probe+count pair
            # roughly doubled sweep wall time on ~62M-row entries)
            try:
                n_s = fn(spark, sf_dir).count()
            except Exception as e:
                failures.append(name)
                print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
                continue
            why = ("rows-only at caller request — oracle declared "
                   "infeasible at this scale" if rows_only
                   else "no oracle — rows-only check")
            print(f"SKIP {name}: {why} ({n_s} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        # engine-attributable wall split (VERDICT r9 #2): one combined
        # number made "dedup_keep_best 2766.6s" unattributable — most of
        # it was DuckDB.  t_spark covers plan+execute on the Spark side,
        # t_duck the oracle execute+fetch/digest.
        t_spark = t_duck = 0.0
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            if hash_threshold:
                # limit-probe: for small results this IS the full set
                # (one execution, as before); larger ones switch to the
                # distributed digest without ever collecting rows
                probe = [tuple(r) for r in
                         sdf.limit(hash_threshold + 1).collect()]
                big = len(probe) > hash_threshold
                s_rows = None if big else probe
            else:
                big = False
                s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        t_spark += time.time() - t0
        if big:
            from hpctoolkit_dataframe_spark import oracle_hash as oh

            col_order = sorted(s_cols)
            t1 = time.time()
            try:
                s_dig = oh.spark_digest(sdf, col_order)
            except Exception as e:
                failures.append(name)
                print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
                continue
            t_spark += time.time() - t1
            t1 = time.time()
            try:
                res = con.execute(sql)
                d_cols = [d[0] for d in res.description]
                if sorted(s_cols) != sorted(d_cols):
                    failures.append(name)
                    print(f"FAIL {name}: columns differ: spark={s_cols} "
                          f"duck={d_cols}")
                    continue
                d_dig = oh.duckdb_digest(res, col_order)
            except Exception as e:
                failures.append(name)
                print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
                continue
            t_duck = time.time() - t1
            if s_dig[0] != d_dig[0]:
                failures.append(name)
                print(f"FAIL {name}: row count: spark={s_dig[0]} "
                      f"duck={d_dig[0]}")
            elif s_dig != d_dig:
                failures.append(name)
                print(f"FAIL {name}: multiset digest mismatch over "
                      f"{s_dig[0]} rows (value-exact compare; rerun the "
                      "exact path on a filtered slice to diagnose)")
            else:
                print(f"OK   {name}: {s_dig[0]} rows "
                      f"(hash-compare{tag}, spark {t_spark:.1f}s + "
                      f"duck {t_duck:.1f}s)")
            continue
        t1 = time.time()
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        t_duck = time.time() - t1
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns differ: spark={s_cols} duck={d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            s_idx = [s_cols.index(c) for c in sorted(s_cols)]
            d_idx = [d_cols.index(c) for c in sorted(d_cols)]
            s_sorted = canon([[r[i] for i in s_idx] for r in s_rows])
            d_sorted = canon([[r[i] for i in d_idx] for r in d_rows])
            exact = near = 0
            first_diff = None
            for sr, dr in zip(s_sorted, d_sorted):
                if sr == dr:
                    exact += 1
                elif all(approx_equal(a, b) for a, b in zip(sr, dr)):
                    near += 1
                elif first_diff is None:
                    first_diff = (sr, dr)
            if first_diff:
                problems.append(f"values differ, e.g.\n  spark={first_diff[0]}\n"
                                f"  duck ={first_diff[1]}")
            elif near and lenient:
                print(f"WARN {name}: {near}/{len(s_rows)} rows only "
                      f"approx-equal (float drift risk)")
            elif near:
                # the driver hashes exact values — near-miss drift IS a
                # red row there (VERDICT r5 #2)
                problems.append(
                    f"{near}/{len(s_rows)} rows only approx-equal "
                    "(float drift; driver hashes exact — would be red)")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(s_rows)} rows (spark {t_spark:.1f}s + "
                  f"duck {t_duck:.1f}s{tag})")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
