"""ANN / k-means training behavior beyond the oracle gate: recall vs
brute force, Lloyd's-objective monotonicity, and training invariants."""

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.queries import REGISTRY, load_table
from hpctoolkit_dataframe_spark.queries import vectors as V

from .conftest import SF_DIR


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_trained_ivf_recall_vs_bruteforce(spark):
    exact = _pairs(REGISTRY["knn_cosine"].fn(spark, SF_DIR))
    trained = _pairs(REGISTRY["ivf_ann_trained"].fn(spark, SF_DIR))
    assert len(exact) == V.N_QUERIES * V.TOP_K
    # N_PROBE=2 of 8 trained cells must recover nearly all true top-3
    assert len(exact & trained) >= 13  # recall@3 >= 0.86 (measured 14/15)


def test_kmeans_training_invariants(spark):
    rows = REGISTRY["kmeans_centroids"].fn(spark, SF_DIR).collect()
    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    assert 0 < len(rows) <= V.N_CELLS
    # every vector is assigned to exactly one surviving cell
    assert sum(r.n_vecs for r in rows) == n_corpus
    for r in rows:
        assert len(r.centroid_q.split("/")) == V.DIM
        assert r.inertia >= 0


def test_lloyd_inertia_non_increasing(spark):
    """Each Lloyd's step reassigns against better centroids, so the
    assignment cost must not increase between iterations."""
    emb = V._quantized_corpus(spark, SF_DIR)
    costs = []
    for iters in (1, 2):
        _, assigned = V._lloyd(emb, iters)
        costs.append(assigned.agg(F.sum("d")).collect()[0][0])
    assert costs[1] <= costs[0]


def test_pq_adc_distance_is_reconstruction_distance(spark):
    """Definitional PQ property: adc_d must equal the exact integer L2
    between the query's subvectors and the NEIGHBOR'S RECONSTRUCTION
    (its per-subspace codebook centroids) — verified in pure Python
    from the trained codebooks and emitted codes."""
    from hpctoolkit_dataframe_spark.queries.vectors import (
        M_SUB, SUBDIM, _pq_train)

    emb, cents, _ = _pq_train(spark, SF_DIR)
    cent = {(r["m"], r["cell"]): r["ce"] for r in cents.collect()}
    codes = {r["vec_id"]: [int(c) for c in r["code"].split("/")]
             for r in REGISTRY["pq_codes"].fn(spark, SF_DIR).collect()}
    qe = {r["vec_id"]: r["qe"] for r in emb.collect()}
    rows = REGISTRY["pq_ann"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        q = qe[r["query_id"]]
        want = 0
        for m in range(M_SUB):
            sub = q[m * SUBDIM:(m + 1) * SUBDIM]
            ce = cent[(m, codes[r["neighbor_id"]][m])]
            want += sum((a - b) * (a - b) for a, b in zip(sub, ce))
        assert r["adc_d"] == want, r
    # regression floor vs brute force: 8-code codebooks on L2-ranked
    # ADC vs cosine-ranked ground truth — recall@3 measured 0.33 at
    # sf0.001; a real deployment widens K_PQ and probes via IVF first
    knn = {(r["query_id"], r["neighbor_id"]) for r in
           REGISTRY["knn_cosine"].fn(spark, SF_DIR).collect()}
    pq = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(knn & pq) / len(knn) >= 0.2


def test_ivfpq_candidates_respect_probed_cells(spark):
    """Composition contract: every ivfpq neighbor must (a) be ADC-scored
    identically to pq_ann's scoring (same codebooks), and (b) live in
    one of the query's N_PROBE probed coarse cells."""
    emb = V._quantized_corpus(spark, SF_DIR)
    cents, assigned = V._lloyd(emb)
    cell_of = {r.vec_id: r.cell for r in
               assigned.select("vec_id", "cell").collect()}
    # recompute each query's probed cells exactly as the query does
    probes = {}
    cent_rows = cents.collect()
    qe = {r.vec_id: r.qe for r in
          emb.filter(F.col("vec_id") < V.N_QUERIES).collect()}
    for qid, q in qe.items():
        ds = sorted(
            (sum((a - b) * (a - b) for a, b in zip(q, c.ce)), c.cell)
            for c in cent_rows)
        probes[qid] = {cell for _, cell in ds[:V.N_PROBE]}
    rows = REGISTRY["ivfpq_ann"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert cell_of[r.neighbor_id] in probes[r.query_id], r


def test_ivfpq_subset_of_pq_ranking(spark):
    """With the same codes, ivfpq's ranked list per query must be the
    pq_ann ADC ordering RESTRICTED to the probed cells — i.e. every
    (query, neighbor, adc_d) triple in ivfpq appears with the same
    adc_d in an unrestricted ADC scan."""
    full = {(r.query_id, r.neighbor_id): r.adc_d
            for r in REGISTRY["pq_ann"].fn(spark, SF_DIR).collect()}
    for r in REGISTRY["ivfpq_ann"].fn(spark, SF_DIR).collect():
        got = full.get((r.query_id, r.neighbor_id))
        if got is not None:  # pq_ann keeps only ITS top-k
            assert got == r.adc_d, r


# ---------------------------------------------------------------------------
# Recall/parameter sweep (VERDICT r6 next #4): pin recall@k curves at
# sf0.1 so the accuracy-cost trade is explicit and a codebook/centroid
# regression surfaces as a recall drop.  Everything here is fully
# deterministic (no RNG anywhere in the pipeline), so the floors have
# slack only against testdata regeneration, not run-to-run noise.
# Measured r7 @ sf0.1, k=10: ivf (1,.98)(2,.98)(4,1.0)(8,1.0);
# ivf_trained (1,.98)(2,.98)(4,.98)(8,1.0); pq full-scan ADC .24 —
# low because the synthetic near-random embeddings concentrate cosine
# distances (PQ quantization error dominates); random guessing would
# be k/N = 0.005, so .1 still guards a broken codebook by 20x.
# ---------------------------------------------------------------------------
SF01 = "/root/testdata/sf0.1"


def test_ivf_recall_curve(spark):
    curve = V.recall_curve(spark, SF01, "ivf", probes=(1, 2, 4, 8), k=10)
    recalls = [r for _, r in curve]
    assert recalls == sorted(recalls), curve  # candidate set only grows
    assert recalls[0] >= 0.9, curve
    # probing every cell makes flat IVF exhaustive -> exact by construction
    assert recalls[-1] == 1.0, curve


def test_ivf_trained_recall_curve(spark):
    curve = V.recall_curve(spark, SF01, "ivf_trained",
                           probes=(1, 8), k=10)
    assert curve[0][1] >= 0.9, curve
    assert curve[-1][1] == 1.0, curve


def test_ivfpq_full_probe_equals_pq(spark):
    """Probing all N_CELLS coarse cells must make IVFPQ's candidate set
    the full corpus, i.e. exactly pq_ann's ADC ranking — the probe
    layer is lossless; only ADC quantization costs recall."""
    ivfpq_full = V.recall_curve(spark, SF01, "ivfpq",
                                probes=(V.N_CELLS,), k=10)[0][1]
    pq = V.pq_recall(spark, SF01, k=10)
    assert ivfpq_full == pq, (ivfpq_full, pq)
    assert pq >= 0.1, pq  # 20x the random-guess baseline of k/N=0.005
