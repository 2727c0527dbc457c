"""r13 Arrow exact-int64 vector kernels (_veckernel): bit-equivalence
against an independent pure-Python reference implementing the former
interpreted lambda semantics — including the degenerate rows the
vectorized path must route to its exact fallback (NULL array, NULL
element, ragged length, |component| beyond the int64-safety bound)."""

import math

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.queries import vectors as V
from hpctoolkit_dataframe_spark.queries import _veckernel as K

from .conftest import SF_DIR


# independent reference: aggregate(zip_with(qe, ce, (a,b)->(a-b)^2),0,+)
def _ref_d(qe, ce):
    if qe is None or ce is None or len(qe) != len(ce):
        return None
    acc = 0
    for a, b in zip(qe, ce):
        if a is None or b is None:
            return None
        acc += (a - b) * (a - b)
    return acc


def _ref_best(qe, book):
    keyed = [((-1 if _ref_d(qe, ce) is None else _ref_d(qe, ce)), cell,
              _ref_d(qe, ce)) for cell, ce in book]
    keyed.sort(key=lambda t: (t[0], t[1]))
    return keyed


BIG = K._BOUND * 4  # beyond the vectorized-path bound, valid int64 math
ROWS = [
    (0, [1, 2, 3, 4]),
    (1, [4, 3, 2, 1]),
    (2, None),                  # NULL array
    (3, [1, None, 3, 4]),       # NULL element
    (4, [1, 2, 3]),             # ragged short
    (5, [1, 2, 3, 4, 5]),       # ragged long
    (6, [BIG, -BIG, 0, 7]),     # big components -> exact fallback
    (7, [0, 0, 0, 0]),
]
BOOK = [
    (0, [0, 0, 0, 0]),
    (1, [2, 2, 2, 2]),
    (2, [BIG, 0, 0, 0]),        # big centroid
]
BOOK_DEGENERATE = BOOK + [
    (3, None),                  # NULL centroid: dk=-1 wins everywhere
    (4, [1, 1, 1]),             # ragged centroid
]


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, qe) for i, qe in rows], "vec_id long, qe array<long>")


def test_nearest_cell_matches_reference(spark):
    for book in (BOOK, BOOK_DEGENERATE):
        got = {r["vec_id"]: (r["cell"], r["d"])
               for r in V._nearest_cell(_emb(spark, ROWS), book).collect()}
        for vid, qe in ROWS:
            _dk, cell, d = _ref_best(qe, book)[0]
            assert got[vid] == (cell, d), (vid, book)


def test_ranked_cells_matches_reference(spark):
    n_best = 3
    for book in (BOOK, BOOK_DEGENERATE):
        df = V._ranked_cells(_emb(spark, ROWS), book, n_best)
        got = {}
        for r in df.collect():
            got.setdefault(r["vec_id"], []).append(r["cell"])
        for vid, qe in ROWS:
            want = [cell for _dk, cell, _d in _ref_best(qe, book)[:n_best]]
            assert sorted(got[vid]) == sorted(want), (vid, book)


def test_pq_assign_matches_reference(spark):
    sub = V.SUBDIM
    rows = [(0, list(range(V.DIM))),
            (1, [None] * V.DIM),                 # NULL elements
            (2, None),                           # NULL array
            (3, list(range(10)))]                # ragged
    seed = [(c, [c * 10 + j for j in range(sub)]) for c in range(3)]
    books = [seed if m != 2 else [] for m in range(V.M_SUB)]  # one empty
    got = {(r["m"], r["vec_id"]): (r["cell"], r["d"], r["qe"])
           for r in V._pq_assigned(_emb(spark, rows), books).collect()}
    for vid, qe in rows:
        for m in range(V.M_SUB):
            if not books[m]:
                assert (m, vid) not in got
                continue
            sl = None if qe is None else qe[m * sub:(m + 1) * sub]
            _dk, cell, d = _ref_best(sl, books[m])[0]
            cell_g, d_g, qe_g = got[(m, vid)]
            assert (cell_g, d_g) == (cell, d), (vid, m)
            assert qe_g == sl, (vid, m)


def test_hyperplane_bucket_matches_reference(spark):
    """bucket = sum over planes of (1<<k iff dot >= 0 else 0); a NULL
    dot (NULL/ragged row, NULL element) contributes 0 — the former
    when(dot >= 0, …).otherwise(0) semantics."""
    planes = [[1, -1, 1, -1], [-1, -1, 1, 1]]
    rows = [(0, [5, 1, 1, 1]),        # d0=6>=0, d1=-4<0  -> 1
            (1, [-5, -1, -1, -1]),    # d0=-6<0, d1=4>=0  -> 2
            (2, [0, 0, 0, 0]),        # both 0 >= 0       -> 3
            (3, None),                # NULL row          -> 0
            (4, [1, None, 1, 1]),     # NULL element      -> 0
            (5, [1, 2]),              # ragged            -> 0
            (6, [BIG, 0, 0, 0])]      # big -> exact path -> 1
    got = {r["vec_id"]: r["b"] for r in _emb(spark, rows).select(
        "vec_id",
        K.hyperplane_bucket_udf(planes)(F.col("qe")).alias("b")).collect()}
    assert got == {0: 1, 1: 2, 2: 3, 3: 0, 4: 0, 5: 0, 6: 1}


def test_knn_pair_scores_matches_bruteforce(spark):
    """The GEMM + per-batch top-k pruning yields EXACTLY the rows the
    former broadcast-join + interpreted dot fed the window, after the
    window: compare the full query against brute force on sf0.001."""
    df = V._exact_topk(spark, SF_DIR, V.TOP_K)
    got = {(r.query_id, r.neighbor_id): (r.rk, r.cos)
           for r in df.collect()}
    emb = [(r.vec_id, list(r.qe), r.n2) for r in
           V.load_table(spark, SF_DIR, "embeddings")
           .filter(V._nonzero_embedding(F.col("embedding")))
           .select("vec_id", V._qint(F.col("embedding")).alias("qe"),
                   V._norm2(F.col("embedding")).alias("n2"))
           .collect()]
    want = {}
    for q_vid, q_qe, q_n2 in emb:
        if q_vid >= V.N_QUERIES:
            continue
        scored = []
        for vid, qe, n2 in emb:
            if vid == q_vid:
                continue
            dot = sum(a * b for a, b in zip(q_qe, qe))
            cos = float(dot) / (math.sqrt(float(q_n2))
                                * math.sqrt(float(n2)))
            scored.append((cos, vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rk, (cos, vid) in enumerate(scored[:V.TOP_K], start=1):
            want[(q_vid, vid)] = (rk, cos)
    assert got == want
