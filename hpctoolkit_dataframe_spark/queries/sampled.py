"""SAMPLED oracle twins for scale-infeasible oracles (VERDICT r8 #2).

Some registry entries have DuckDB twins whose cost is inherently
super-linear in corpus size — ``semantic_decontaminate``'s SQL is a
|train| x |bench| crossJoin (3.5e9 pairs at the 100x clone) that no
timeout rescues, while the Spark side runs a broadcast GEMM in ~150 s.
Above the scale where the whole-result oracle is feasible those rows
used to degrade to rows-only.

A SAMPLED twin restores VALUE-LEVEL evidence at any scale: both
engines restrict the independent (probe) dimension to a deterministic
residue class ``key % SAMPLE_MOD == 0`` — pushed INSIDE the oracle so
DuckDB's pair count divides by the modulus — and the full comparison
(row count + schema + order-insensitive value hash) runs on the
sampled result.  Every sampled verdict is EXACT, because sampling only
the probe dimension leaves each probe's inputs (the full benchmark
side) untouched; what weakens is coverage (1/SAMPLE_MOD of the rows),
which the sweep artifact records explicitly.

Only entries listed here may be sampled; the gate replica
(tools/oracle_check.py --sampled=...) refuses unknown names so a
sampled row can never silently stand in for a full one.
"""

from __future__ import annotations

from . import Query, curation

SAMPLE_MOD = 50


def _sem_decon_sampled(spark, sf_dir):
    return curation.semantic_decontaminate(spark, sf_dir,
                                           sample_mod=SAMPLE_MOD)


SAMPLED: dict[str, Query] = {
    "semantic_decontaminate": Query(
        _sem_decon_sampled,
        curation._sem_decon_sql(f"vec_id % {SAMPLE_MOD} = 0"),
        doc="probe side restricted to vec_id % 50 == 0; bench side "
            "full — sampled verdicts exact, oracle pairs / 50"),
}
