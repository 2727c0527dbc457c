#!/usr/bin/env python
"""Continuous fleet profile-merge demo: N experiment XML copies land in
waves in a directory; each drain of the availableNow stream parses
only the newly landed files (checkpointed offsets), partial-merges
them per callpath (sum/min/max combine kinds), and appends to the
batch_id-partitioned merged-CCT store.  The final re-merge of partials
equals merge_profiles over the whole fleet (streaming/profiles.py —
twin-pinned in tests/test_profile_stream.py).

Usage: python tools/profile_stream_run.py [n_copies] [n_waves]
Prints one JSON line: per-wave file/row throughput + merged store
facts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from hpctoolkit_dataframe_spark.streaming import profiles as sp  # noqa: E402

SRC = "/root/reference/test/data/experiment1.xml"
COMBINES = {
    "CPUTIME (usec):Sum (I)": "sum",
    "CPUTIME (usec):Min (I)": "min",
    "CPUTIME (usec):Max (I)": "max",
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    tmp = tempfile.mkdtemp(prefix="profile_stream_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    base, ckpt = os.path.join(tmp, "stores"), os.path.join(tmp, "ckpt")
    spark = get_spark("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")
    per_wave = max(1, n // waves)
    wave_stats = []
    landed = 0
    try:
        for w in range(waves):
            for i in range(per_wave):
                shutil.copy(SRC, os.path.join(
                    landing, f"node_{w:02d}_{i:04d}.xml"))
            landed += per_wave
            t0 = time.time()
            stream = sp.read_profile_stream(spark, landing)
            sp.run_profile_merge_stream(stream, base, ckpt, COMBINES,
                                        query_name=f"pm_wave{w}")
            wave_stats.append({"wave": w, "files": per_wave,
                               "sec": round(time.time() - t0, 2)})
        merged = sp.merged_profile_cct(spark, base, COMBINES)
        root = merged.filter(F.size("callpath") == 0).collect()[0]
        out = {
            "files_total": landed,
            "waves": wave_stats,
            "merged_nodes": merged.count(),
            "root_n_profiles": root["n_profiles"],
            "root_sum": root["CPUTIME (usec):Sum (I)"],
        }
        assert out["root_n_profiles"] == landed
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
