#!/usr/bin/env python
"""Direct A/B parity check: run the ACTUAL reference implementation
(pandas, /root/reference) and this engine side-by-side on the
reference's own experiment databases and compare numerically.

Stronger than the captured goldens in FIXTURES.md — nothing is
hard-coded; whatever the reference computes right now is the oracle.

Usage: python tools/parity_check.py
"""

from __future__ import annotations

import os
import pathlib
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference depends on the tiny `ordered_set` package (order-
# preserving dedup only); provide a minimal stand-in if absent
try:
    import ordered_set  # noqa: F401
except ImportError:
    shim = types.ModuleType("ordered_set")

    class OrderedSet:  # dict preserves insertion order
        def __init__(self, iterable=()):
            self._d = dict.fromkeys(iterable)

        def __iter__(self):
            return iter(self._d)

        def __contains__(self, x):
            return x in self._d

        def __len__(self):
            return len(self._d)

    shim.OrderedSet = OrderedSet
    sys.modules["ordered_set"] = shim

sys.path.insert(1, "/root/reference")

EXPERIMENTS = [
    "/root/reference/test/data/experiment1.xml",
    "/root/reference/test/data/experiment2.xml",
]


def main() -> None:
    from hpctoolkit_dataframe.hpctoolkit_dataframe import (
        HPCtoolkitDataFrame as RefFrame,
    )

    from hpctoolkit_dataframe_spark import (
        HPCtoolkitDataFrame as SparkFrame,
        get_spark,
    )

    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0

    for path in EXPERIMENTS:
        name = os.path.basename(path)
        ref = RefFrame(path=pathlib.Path(path))
        ours = SparkFrame(path=path, spark=spark)
        ours._df = ours._df.cache()

        # shape (minus our profile_id extension)
        ref_shape = ref.shape
        ours_rows = ours.count()
        ours_cols = len(ours.columns) - 1
        ok = (ours_rows, ours_cols) == ref_shape
        failures += not ok
        print(f"{name} shape: ref={ref_shape} ours=({ours_rows},{ours_cols})"
              f" {'OK' if ok else 'MISMATCH'}")

        # every metric column, all rows: compare by id (complex cells by
        # real part, NaN==null)
        import math

        check_cols = [c for c in ref.columns if c != "callpath"]
        ours_rows_by_id = {r["id"]: r for r in ours.df.collect()}
        bad = 0
        for rid, ref_row in ref.iterrows():
            mine = ours_rows_by_id.get(rid)
            if mine is None:
                bad += 1
                continue
            if tuple(ref_row["callpath"]) != tuple(mine["callpath"]):
                bad += 1
            for col in check_cols:
                rv = ref_row[col]
                mv = mine[col]
                if isinstance(rv, pathlib.Path):
                    rv = str(rv)
                if isinstance(rv, complex):
                    rv = rv.real
                if rv is None or (isinstance(rv, float) and math.isnan(rv)):
                    if mv is not None and not (
                            isinstance(mv, float) and math.isnan(mv)):
                        bad += 1
                elif isinstance(rv, float):
                    if mv is None or abs(rv - mv) > 1e-9 * max(
                            1.0, abs(rv)):
                        bad += 1
                elif rv != mv:
                    bad += 1
        failures += bad > 0
        print(f"{name} cell parity over {len(check_cols)} cols x "
              f"{ref_shape[0]} rows: {bad} mismatches "
              f"{'OK' if bad == 0 else 'MISMATCH'}")

        # hot_path chains (ids in descent order)
        ref_chain = [int(i) for i in ref.hot_path().index]
        ours_chain = [r["id"] for r in sorted(
            ours.hot_path().select("id", "callpath").collect(),
            key=lambda r: len(r["callpath"]))]
        ok = ref_chain == ours_chain
        failures += not ok
        print(f"{name} hot_path: {len(ref_chain)} nodes "
              f"{'OK' if ok else f'MISMATCH ref={ref_chain} ours={ours_chain}'}")
        ours._df.unpersist()

    print(f"\n{'PARITY OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
