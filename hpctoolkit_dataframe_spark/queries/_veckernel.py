"""Exact-int64 Arrow kernels for the vector family (r13, guide §4.2).

The kmeans/IVF/PQ assignment passes and the knn/IVF candidate scoring
used to run as Catalyst higher-order-function lambdas (``transform`` /
``zip_with`` / ``aggregate``), which evaluate INTERPRETED per element —
~1 µs/element, 512 elements per assignment row — the suite's measured
CPU floor at 8 cores (VERDICT r12 #1).  These kernels move exactly that
arithmetic into numpy int64 (vectorized, exact — the
semantic_decontaminate / semdedup GEMM precedent) while keeping the
established safe boundary: quantization (``_qint``) and norms
(``_norm2``) stay JVM-side, because Spark's ROUND(double) is
BigDecimal HALF_UP over the decimal rendering — NOT reproducible with
floor(x+0.5) in binary — whereas sums/products/argmins of already-
quantized BIGINTs are exact in both worlds.

Bit-identical contract, replicated op for op:

- distance d(qe, ce) = aggregate(zip_with(qe, ce, (a,b)->(a-b)*(a-b)),
  0L, acc+v): NULL iff either array is NULL, lengths differ (zip_with
  pads with NULL), or any element is NULL; else the exact int64 sum.
- argmin order = (dk, cell) with dk = coalesce(d, -1): NULL distances
  sort FIRST, ties break on the lowest cell — byte-for-byte the former
  window's ``d ASC NULLS FIRST, cell ASC`` (vectors.py r12 comment).
- cosine = double(dot) / (sqrt(double(qn2)) * sqrt(double(cn2))): every
  op IEEE correctly rounded, so numpy float64 == JVM double bit-exact.

Degenerate rows (NULL array, NULL element, ragged length, |component|
> _BOUND) take an exact per-row Python-int fallback implementing the
same NULL semantics; int64 overflow in the fallback RAISES like ANSI
would (numpy would silently wrap).  |component| <= _BOUND guarantees
every vectorized intermediate fits int64:
d = |a|^2 - 2 a.c + |c|^2 <= 4 * dim * _BOUND^2 = 2.6e18 < 2^63.

Everything here runs worker-side: factories call
``register_module_by_value`` before building a UDF (CLAUDE.md rule),
and UDFs are created lazily inside query functions (a module-import
``@pandas_udf`` throws SESSION_OR_CONTEXT_NOT_EXISTS).
"""

from __future__ import annotations

import math

import pandas as pd  # module-level: pandas_udf type-hint resolution
                     # evaluates 'pd.Series' against these globals

from .._pickle import register_module_by_value

_BOUND = 10**8
_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1
_F_EXACT = 2**53  # floats above this can't be trusted to be exact ints


# ---------------------------------------------------------------------------
# exact per-row fallback arithmetic (Python ints, ANSI overflow twin)
# ---------------------------------------------------------------------------
def _ck(v: int) -> int:
    """ANSI overflow twin: the JVM lambda throws ArithmeticException on
    any long overflow; numpy would wrap silently — raise instead."""
    if v < _I64_MIN or v > _I64_MAX:
        raise ArithmeticError("BIGINT overflow (ANSI arithmetic twin)")
    return v


def _row_list(a):
    """One Arrow->pandas array cell to a Python list of int/None (or
    None for a NULL array).  pyarrow renders a list<int64> row with
    NULL elements as float64+NaN — exact for |v| < 2^53, raise beyond
    (can't reconstruct the original int)."""
    if a is None:
        return None
    out = []
    for v in (a.tolist() if hasattr(a, "tolist") else list(a)):
        if v is None:
            out.append(None)
        elif isinstance(v, float):
            if math.isnan(v):
                out.append(None)
            elif abs(v) <= _F_EXACT and v == int(v):
                out.append(int(v))
            else:
                raise ArithmeticError(
                    "non-integral/huge float in quantized array "
                    "(lossy Arrow null rendering)")
        else:
            out.append(int(v))
    return out


def _d_exact(qe, ce):
    """aggregate(zip_with(qe, ce, (a,b)->(a-b)*(a-b)), 0L, acc+v) in
    Python ints: NULL on NULL array / ragged / NULL element."""
    if qe is None or ce is None or len(qe) != len(ce):
        return None
    acc = 0
    for a, b in zip(qe, ce):
        if a is None or b is None:
            return None
        v = _ck(a - b)
        v = _ck(v * v)
        acc = _ck(acc + v)
    return acc


def _dot_exact(qe, ce):
    """aggregate(zip_with(qe, ce, (a,b)->a*b), 0L, acc+v) in Python
    ints — same NULL semantics as _d_exact."""
    if qe is None or ce is None or len(qe) != len(ce):
        return None
    acc = 0
    for a, b in zip(qe, ce):
        if a is None or b is None:
            return None
        acc = _ck(acc + _ck(a * b))
    return acc


def _best_cell_exact(row, book):
    """Exact argmin over (coalesce(d,-1), cell) for one degenerate row.
    ``book`` rows are (cell, ce-list-or-None)."""
    best = None
    for cell, ce in book:
        d = _d_exact(row, ce)
        key = (-1 if d is None else d, cell)
        if best is None or key < best[0]:
            best = (key, cell, d)
    return (best[1], best[2]) if best else (None, None)


def _ranked_exact(row, book, n_best):
    """Exact (dk, cell)-ordered first-n_best cells for one row."""
    keyed = sorted(((_d_exact(row, ce), cell) for cell, ce in book),
                   key=lambda t: (-1 if t[0] is None else t[0], t[1]))
    return [cell for _d, cell in keyed[:n_best]]


# ---------------------------------------------------------------------------
# book/batch preparation for the vectorized path
# ---------------------------------------------------------------------------
def _prep_book(book, dim):
    """Split a driver-collected [(cell, ce), ...] codebook (already
    cell-sorted) into the vectorizable part and the exceptions:

    - ids/C: clean centroids (len == dim, no NULLs, |v| <= _BOUND) as
      an int64 matrix in cell order;
    - null_cells: centroids whose distance is NULL against EVERY
      dim-length row (NULL array / ragged vs dim / NULL element) —
      if any exist, dk=-1 makes the LOWEST such cell every clean row's
      argmin (the window's NULLS FIRST semantics);
    - big_cells: well-formed but with |v| > _BOUND — valid distances
      that need the exact Python path per row.
    """
    import numpy as np

    vec, null_cells, big_cells = [], [], []
    for cell, ce in book:
        if ce is None or len(ce) != dim or any(v is None for v in ce):
            null_cells.append(cell)
        elif any(abs(v) > _BOUND for v in ce):
            big_cells.append((cell, [int(v) for v in ce]))
        else:
            vec.append((cell, ce))
    ids = np.array([c for c, _ in vec], dtype=np.int64)
    c_mat = (np.array([ce for _, ce in vec], dtype=np.int64)
             if vec else np.empty((0, dim), dtype=np.int64))
    return ids, c_mat, sorted(null_cells), sorted(big_cells)


def _split_batch(vals, dim):
    """Classify one Arrow batch's array column (object ndarray of rows)
    into the vectorizable majority and the degenerate exceptions.

    Returns (fast_idx int64[], mat int64[nf, dim], slow_idx list) —
    ``slow_idx`` rows get the exact Python fallback."""
    import numpy as np

    n = len(vals)
    try:
        mat = np.stack(vals)
        if (mat.ndim == 2 and mat.shape[1] == dim
                and mat.dtype.kind in "iu"
                and (n == 0 or int(np.abs(mat).max()) <= _BOUND)):
            return np.arange(n), mat.astype(np.int64, copy=False), []
    except Exception:
        pass
    fast_idx, fast_rows, slow_idx = [], [], []
    for i, a in enumerate(vals):
        ok = False
        try:
            arr = np.asarray(a) if a is not None else None
            ok = (arr is not None and arr.ndim == 1 and len(arr) == dim
                  and arr.dtype.kind in "iu"
                  and int(np.abs(arr).max()) <= _BOUND)
        except Exception:
            ok = False
        if ok:
            fast_idx.append(i)
            fast_rows.append(arr.astype(np.int64, copy=False))
        else:
            slow_idx.append(i)
    mat = (np.stack(fast_rows) if fast_rows
           else np.empty((0, dim), dtype=np.int64))
    return np.asarray(fast_idx, dtype=np.int64), mat, slow_idx


def _dist_matrix(mat, c_mat):
    """Exact int64 squared-L2 distances (nf, k): |a|^2 - 2 a.c + |c|^2.
    All intermediates fit int64 under the _BOUND guard."""
    qq = (mat * mat).sum(axis=1)
    cc = (c_mat * c_mat).sum(axis=1)
    return qq[:, None] - 2 * (mat @ c_mat.T) + cc[None, :]


def _assign_fast(mat, ids, c_mat, null_cells, big_cells, book):
    """(cells int64[nf], ds list[int|None]) — argmin over (dk, cell)
    for clean rows.  Vectorized when the book is fully clean (the
    universal case); exceptional cells handled exactly."""
    import numpy as np

    nf = len(mat)
    if null_cells:
        # dk = -1 beats every defined distance; lowest such cell wins
        return (np.full(nf, null_cells[0], dtype=np.int64), [None] * nf)
    if len(ids) == 0 and not big_cells:
        # book empty is handled JVM-side; defensive
        return np.empty(0, dtype=np.int64), []
    if len(ids):
        d_mat = _dist_matrix(mat, c_mat)
        j = np.argmin(d_mat, axis=1)  # ties -> lowest index = lowest cell
        cells = ids[j]
        ds = d_mat[np.arange(nf), j]
    else:
        cells = None
        ds = None
    if big_cells:
        out_c, out_d = [], []
        for i in range(nf):
            row = mat[i].tolist()
            best = ((int(ds[i]), int(cells[i]))
                    if cells is not None else None)
            for cell, ce in big_cells:
                d = _d_exact(row, ce)
                key = (d, cell)
                if best is None or key < best:
                    best = key
            out_c.append(best[1])
            out_d.append(best[0])
        return (np.asarray(out_c, dtype=np.int64), out_d)
    return cells, [int(v) for v in ds]


def _ranked_fast(mat, ids, c_mat, null_cells, big_cells, book, n_best):
    """list[list[int]]: first-n_best cells per clean row in (dk, cell)
    order.  Vectorized for a fully clean book; exact merge otherwise."""
    import numpy as np

    if null_cells or big_cells:
        return [_ranked_exact(mat[i].tolist(), book, n_best)
                for i in range(len(mat))]
    if len(ids) == 0:
        return [[] for _ in range(len(mat))]
    d_mat = _dist_matrix(mat, c_mat)
    order = np.argsort(d_mat, axis=1, kind="stable")[:, :n_best]
    return ids[order].tolist()


# ---------------------------------------------------------------------------
# expression-level kernels (pandas UDFs; one ArrowEvalPython node)
# ---------------------------------------------------------------------------
def nearest_cell_udf(book, dim):
    """pandas UDF qe -> struct<cell: long, d: long>: each row's nearest
    codebook cell under (coalesce(d,-1), cell) — the Arrow twin of the
    r12 interpreted array_min(_structs_sql) projection.  Marked
    non-deterministic so alias pushdown cannot re-evaluate it below a
    Filter (guide §4.4 — replaces the r12 explode substitution
    barrier)."""
    from pyspark.sql.functions import pandas_udf

    register_module_by_value(__name__)
    prep = _prep_book(book, dim)

    def nearest(qe: pd.Series) -> pd.DataFrame:
        import numpy as np
        import pandas as _pd

        ids, c_mat, null_cells, big_cells = prep
        vals = qe.to_numpy()
        n = len(vals)
        cells = np.empty(n, dtype=object)
        ds = np.empty(n, dtype=object)
        fast_idx, mat, slow_idx = _split_batch(vals, dim)
        if len(fast_idx):
            f_cells, f_ds = _assign_fast(
                mat, ids, c_mat, null_cells, big_cells, book)
            for k, i in enumerate(fast_idx):
                cells[i] = int(f_cells[k])
                ds[i] = f_ds[k]
        for i in slow_idx:
            cells[i], ds[i] = _best_cell_exact(_row_list(vals[i]), book)
        return _pd.DataFrame({
            "cell": _pd.array(cells, dtype="Int64"),
            "d": _pd.array(ds, dtype="Int64"),
        })

    return pandas_udf(nearest, "cell: bigint, d: bigint") \
        .asNondeterministic()


def ranked_cells_udf(book, dim, n_best):
    """pandas UDF qe -> array<bigint>: the first-n_best cells per row
    in (coalesce(d,-1), cell) order — the Arrow twin of the r12
    slice(array_sort(...)) projection (consumers only use the cell
    set; rank order inside the array is preserved anyway)."""
    from pyspark.sql.functions import pandas_udf

    register_module_by_value(__name__)
    prep = _prep_book(book, dim)

    def ranked(qe: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as _pd

        ids, c_mat, null_cells, big_cells = prep
        vals = qe.to_numpy()
        out = np.empty(len(vals), dtype=object)
        fast_idx, mat, slow_idx = _split_batch(vals, dim)
        if len(fast_idx):
            ranked_rows = _ranked_fast(
                mat, ids, c_mat, null_cells, big_cells, book, n_best)
            for k, i in enumerate(fast_idx):
                out[i] = ranked_rows[k]
        for i in slow_idx:
            out[i] = _ranked_exact(_row_list(vals[i]), book, n_best)
        return _pd.Series(out)

    return pandas_udf(ranked, "array<bigint>").asNondeterministic()


def pq_assign_udf(books, subdim):
    """pandas UDF qe -> array<struct<m int, cell long, d long>>: every
    non-empty subspace codebook's argmin for the row's m-th slice, in
    one Python crossing (the Arrow twin of _pq_assigned's per-book
    interpreted argmin columns).  Empty books emit no struct — the old
    join-on-m drop semantics."""
    from pyspark.sql.functions import pandas_udf

    register_module_by_value(__name__)
    m_sub = len(books)
    dim = subdim * m_sub
    preps = [(_prep_book(books[m], subdim) if books[m] else None)
             for m in range(m_sub)]

    def assign(qe: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as _pd

        vals = qe.to_numpy()
        n = len(vals)
        out = np.empty(n, dtype=object)
        for i in range(n):
            out[i] = []
        fast_idx, mat, slow_idx = _split_batch(vals, dim)
        for m in range(m_sub):
            if preps[m] is None:
                continue
            ids, c_mat, null_cells, big_cells = preps[m]
            if len(fast_idx):
                sub = np.ascontiguousarray(
                    mat[:, m * subdim:(m + 1) * subdim])
                f_cells, f_ds = _assign_fast(
                    sub, ids, c_mat, null_cells, big_cells, books[m])
                for k, i in enumerate(fast_idx):
                    out[i].append({"m": m, "cell": int(f_cells[k]),
                                   "d": f_ds[k]})
            for i in slow_idx:
                row = _row_list(vals[i])
                # slice(qe, m*subdim+1, subdim) on a ragged/NULL row:
                # NULL array -> NULL slice; else the available slice
                sub_row = (None if row is None
                           else row[m * subdim:(m + 1) * subdim])
                cell, d = _best_cell_exact(sub_row, books[m])
                out[i].append({"m": m, "cell": cell, "d": d})
        return _pd.Series(out)

    return pandas_udf(
        assign, "array<struct<m: int, cell: bigint, d: bigint>>"
    ).asNondeterministic()


def hyperplane_bucket_udf(planes):
    """pandas UDF qe -> bigint: the 8-plane LSH bucket — per plane k,
    (1 << k) iff dot(qe, plane_k) >= 0 else 0 (a NULL dot — NULL/ragged
    qe — contributes 0, exactly the former ``when(dot >= 0, …)
    .otherwise(0)``); summed.  One int64 GEMM against the bounded ±1
    plane matrix replaces N_PLANES interpreted 64-lane aggregate
    folds per row."""
    from pyspark.sql.functions import pandas_udf

    register_module_by_value(__name__)
    dim = len(planes[0])
    weights = [1 << k for k in range(len(planes))]

    def bucket(qe: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as _pd

        p_mat = np.array(planes, dtype=np.int64)
        w = np.array(weights, dtype=np.int64)
        vals = qe.to_numpy()
        out = np.zeros(len(vals), dtype=np.int64)
        fast_idx, mat, slow_idx = _split_batch(vals, dim)
        if len(fast_idx):
            signs = (mat @ p_mat.T) >= 0
            out[fast_idx] = signs @ w
        for i in slow_idx:
            row = _row_list(vals[i])
            b = 0
            for k, plane in enumerate(planes):
                d = _dot_exact(row, list(plane))
                if d is not None and d >= 0:
                    b += 1 << k
            out[i] = b
        return _pd.Series(out)

    return pandas_udf(bucket, "bigint").asNondeterministic()


# ---------------------------------------------------------------------------
# frame-level kernels (mapInPandas against a bounded broadcast matrix)
# ---------------------------------------------------------------------------
def _query_matrix(qrows, dim):
    """Driver-collected bounded query rows [(vec_id, qe, n2)] ->
    (ids, Q int64[nq, dim], qroots float64) for the vectorized GEMM, or
    None if ANY row is degenerate / off-width (callers then score every
    row through the exact path)."""
    import numpy as np

    clean = []
    for vid, qe, n2 in qrows:
        if (qe is None or n2 is None or n2 <= 0 or len(qe) != dim
                or any(v is None for v in qe)
                or any(abs(v) > _BOUND for v in qe)):
            return None
        clean.append((int(vid), [int(v) for v in qe], int(n2)))
    if not clean:
        return None
    ids = np.array([v for v, _q, _n in clean], dtype=np.int64)
    q_mat = np.array([q for _v, q, _n in clean], dtype=np.int64)
    qroots = np.sqrt(np.array([n for _v, _q, n in clean], dtype=np.int64)
                     .astype(np.float64))
    return ids, q_mat, qroots


def _topk_emit(q_id, neigh, cos, k):
    """Per-batch partial top-k under (cos DESC, neighbor ASC): any
    global top-k row under the same total order survives (there can be
    at most k-1 rows ordered before it anywhere, so at most k-1 in its
    own batch).  Only applied to clean rows; degenerate rows are
    emitted unpruned."""
    import numpy as np

    if len(neigh) <= k:
        sel = np.arange(len(neigh))
    else:
        order = np.lexsort((neigh, -cos))[:k]
        sel = order
    return ([int(q_id)] * len(sel), neigh[sel].tolist(),
            cos[sel].tolist())


def knn_pair_scores(emb, qrows, dim, top_k):
    """mapInPandas over the n2>0-filtered corpus: (query_id,
    neighbor_id, cos) for every (query, corpus row != query) pair,
    pruned per batch to each query's top_k under the final window's
    exact order — the Arrow twin of the r12 broadcast-BNLJ +
    interpreted 64-lane dot (guide §4.2/§8: the query matrix is
    bounded, so scoring is one int64 GEMM per batch; only 3 narrow
    columns cross the boundary back)."""
    register_module_by_value(__name__)
    qm = _query_matrix(qrows, dim)
    raw_q = [(int(r[0]), None if r[1] is None else _row_list(r[1]),
              None if r[2] is None else int(r[2])) for r in qrows]

    def score(batches):
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf["qe"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            n2s = pdf["n2"].to_numpy()
            fast_idx, mat, slow_idx = _split_batch(vals, dim)
            out_q, out_n, out_c = [], [], []
            if qm is not None and len(fast_idx):
                ids, q_mat, qroots = qm
                f_vids = vids[fast_idx].astype(np.int64)
                f_roots = np.sqrt(n2s[fast_idx]
                                  .astype(np.int64).astype(np.float64))
                dots = mat @ q_mat.T                       # exact int64
                cos = dots.astype(np.float64) / (
                    qroots[None, :] * f_roots[:, None])
                for j in range(len(ids)):
                    mask = f_vids != ids[j]
                    qs, ns, cs = _topk_emit(
                        ids[j], f_vids[mask], cos[mask, j], top_k)
                    out_q += qs
                    out_n += ns
                    out_c += cs
            elif len(fast_idx):
                slow_idx = list(slow_idx) + list(fast_idx)
            for i in slow_idx:
                row = _row_list(vals[i])
                n2 = int(n2s[i])
                for q_vid, q_qe, q_n2 in raw_q:
                    if int(vids[i]) == q_vid:
                        continue
                    dot = _dot_exact(q_qe, row)
                    c = (None if dot is None else
                         float(dot) / (math.sqrt(float(q_n2))
                                       * math.sqrt(float(n2))))
                    out_q.append(q_vid)
                    out_n.append(int(vids[i]))
                    out_c.append(c)
            yield _pd.DataFrame({
                "query_id": _pd.array(out_q, dtype="Int64"),
                "neighbor_id": _pd.array(out_n, dtype="Int64"),
                "cos": _pd.array(out_c, dtype="Float64"),
            })

    return emb.select("vec_id", "qe", "n2").mapInPandas(
        score, "query_id long, neighbor_id long, cos double")


def ivf_candidate_scores(emb, book, dim, probe_rows, top_k):
    """Fused IVF probe (guide §2.4 + §4.2): ONE mapInPandas pass over
    the n2>0-filtered corpus assigns each row to its nearest cell
    (exact argmin, as nearest_cell_udf) and scores it against the
    bounded set of queries probing that cell, emitting (query_id,
    neighbor_id, cos) pruned per batch to each query's top_k — the
    per-cell equi-join plus interpreted per-candidate dot disappear.

    ``probe_rows``: [(query_id, qe, n2, [probed cells])], driver-built
    from the same (dk, cell) ranking (bounded: N_QUERIES rows)."""
    register_module_by_value(__name__)
    prep = _prep_book(book, dim)
    qm = _query_matrix([(q, qe, n2) for q, qe, n2, _c in probe_rows], dim)
    probe_sets = [set(c) for _q, _qe, _n2, c in probe_rows]
    raw_q = [(int(q), None if qe is None else _row_list(qe),
              None if n2 is None else int(n2), set(c))
             for q, qe, n2, c in probe_rows]

    def score(batches):
        import numpy as np
        import pandas as _pd

        ids, c_mat, null_cells, big_cells = prep
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf["qe"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            n2s = pdf["n2"].to_numpy()
            fast_idx, mat, slow_idx = _split_batch(vals, dim)
            out_q, out_n, out_c = [], [], []
            if qm is not None and len(fast_idx):
                q_ids, q_mat, qroots = qm
                cells, _ds = _assign_fast(
                    mat, ids, c_mat, null_cells, big_cells, book)
                f_vids = vids[fast_idx].astype(np.int64)
                f_roots = np.sqrt(n2s[fast_idx]
                                  .astype(np.int64).astype(np.float64))
                dots = mat @ q_mat.T
                cos = dots.astype(np.float64) / (
                    qroots[None, :] * f_roots[:, None])
                for j in range(len(q_ids)):
                    probed = probe_sets[j]
                    if not probed:
                        continue
                    mask = np.isin(cells, np.fromiter(
                        probed, dtype=np.int64)) & (f_vids != q_ids[j])
                    qs, ns, cs = _topk_emit(
                        q_ids[j], f_vids[mask], cos[mask, j], top_k)
                    out_q += qs
                    out_n += ns
                    out_c += cs
            elif len(fast_idx):
                slow_idx = list(slow_idx) + list(fast_idx)
            for i in slow_idx:
                row = _row_list(vals[i])
                cell, _d = _best_cell_exact(row, book)
                n2 = int(n2s[i])
                for q_vid, q_qe, q_n2, probed in raw_q:
                    if cell not in probed or int(vids[i]) == q_vid:
                        continue
                    dot = _dot_exact(q_qe, row)
                    c = (None if dot is None else
                         float(dot) / (math.sqrt(float(q_n2))
                                       * math.sqrt(float(n2))))
                    out_q.append(q_vid)
                    out_n.append(int(vids[i]))
                    out_c.append(c)
            yield _pd.DataFrame({
                "query_id": _pd.array(out_q, dtype="Int64"),
                "neighbor_id": _pd.array(out_n, dtype="Int64"),
                "cos": _pd.array(out_c, dtype="Float64"),
            })

    return emb.select("vec_id", "qe", "n2").mapInPandas(
        score, "query_id long, neighbor_id long, cos double")
