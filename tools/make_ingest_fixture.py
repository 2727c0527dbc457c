#!/usr/bin/env python
"""Capture the reference's loaded experiment frames as a parquet fixture.

The fixture (tests/fixtures/ref_ingest.parquet) is the DRIVER-GATE
oracle for the XML ingest path: ``queries()['cct_xml_ingest']`` runs our
Spark ingest live and the DuckDB oracle reads this file, so
CORRECTNESS_r{N} finally exercises parsing, finalization (incl. complex
StdDev), metric-column election, root repair, and both ratio columns
(VERDICT r1 missing #1).

Columns are the generic projection shared by both experiment databases
(their metric tables differ — CPUTIME vs PAPI_MEM_WCY — so we project
the ELECTED percentage family): experiment, id, callpath ('/'-joined),
node_type, sum_i, mean_i, stddev_re, stddev_im, ratio_total,
ratio_parent.  NaN is stored as NULL (Spark-side convention).

Regenerate with: python tools/make_ingest_fixture.py
(only needed if the reference or the projection changes)
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import ordered_set  # noqa: F401
except ImportError:  # minimal stand-in (order-preserving dedup only)
    shim = types.ModuleType("ordered_set")

    class OrderedSet:
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

EXPERIMENTS = {
    "experiment1": "/root/reference/test/data/experiment1.xml",
    "experiment2": "/root/reference/test/data/experiment2.xml",
}
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "ref_ingest.parquet")


def _clean(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return float(v)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hpctoolkit_dataframe.hpctoolkit_dataframe import (
        HPCtoolkitDataFrame as RefFrame,
    )

    cols = {k: [] for k in (
        "experiment", "id", "callpath", "node_type", "sum_i", "mean_i",
        "stddev_re", "stddev_im", "ratio_total", "ratio_parent",
        "procedure", "depth", "sum_e_c")}
    for name, path in EXPERIMENTS.items():
        ref = RefFrame(path=pathlib.Path(path))
        # the elected percentage column is '<metric>:Mean (I)'
        pct = ref._meaningful_columns["percentage"]
        base = pct[: -len(":Mean (I)")]
        for rid, row in ref.iterrows():
            cols["experiment"].append(name)
            cols["id"].append(int(rid))
            cols["callpath"].append(
                "/".join(str(int(i)) for i in row["callpath"]))
            cols["node_type"].append(row["type"])
            proc = row.get("procedure")
            cols["procedure"].append(
                proc if isinstance(proc, str) else None)
            cols["depth"].append(len(row["callpath"]))
            # exclusive sum as HALF_UP cents (for the flat-profile
            # view: integer sums are reduction-order independent)
            se = _clean(row[f"{base}:Sum (E)"])
            cols["sum_e_c"].append(
                None if se is None else int(math.floor(se * 100 + 0.5)))
            cols["sum_i"].append(_clean(row[f"{base}:Sum (I)"]))
            cols["mean_i"].append(_clean(row[pct]))
            sd = row[f"{base}:StdDev (I)"]
            if isinstance(sd, complex):
                re_, im_ = _clean(sd.real), _clean(sd.imag)
            else:
                re_ = _clean(sd)
                im_ = 0.0 if re_ is not None else None
            # scaled-BIGINT cents: the StdDev formula contains pow+sqrt,
            # whose library implementations differ by ~1 ULP between
            # engines (and the JVM's Math.pow is JIT-bistable), so raw
            # doubles here are not hash-stable; values are non-negative
            # so floor(x*100+0.5) is HALF_UP
            cols["stddev_re"].append(
                None if re_ is None else int(math.floor(re_ * 100 + 0.5)))
            cols["stddev_im"].append(
                None if im_ is None else int(math.floor(im_ * 100 + 0.5)))
            cols["ratio_total"].append(_clean(row[f"{pct} ratio of total"]))
            cols["ratio_parent"].append(_clean(row[f"{pct} ratio of parent"]))
        print(f"{name}: {len(ref)} rows, pct={pct!r}")

    table = pa.table({
        "experiment": pa.array(cols["experiment"], pa.string()),
        "id": pa.array(cols["id"], pa.int64()),
        "callpath": pa.array(cols["callpath"], pa.string()),
        "node_type": pa.array(cols["node_type"], pa.string()),
        "sum_i": pa.array(cols["sum_i"], pa.float64()),
        "mean_i": pa.array(cols["mean_i"], pa.float64()),
        "stddev_re": pa.array(cols["stddev_re"], pa.int64()),
        "stddev_im": pa.array(cols["stddev_im"], pa.int64()),
        "ratio_total": pa.array(cols["ratio_total"], pa.float64()),
        "ratio_parent": pa.array(cols["ratio_parent"], pa.float64()),
        "procedure": pa.array(cols["procedure"], pa.string()),
        "depth": pa.array(cols["depth"], pa.int64()),
        "sum_e_c": pa.array(cols["sum_e_c"], pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
