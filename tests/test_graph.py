"""connected_components: property-tested against a driver-side
union-find on random graphs (including chain graphs, the adversarial
case for plain label propagation), plus the dedup_clusters invariants.
"""

import random

import pytest
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.operators.graph import connected_components
from hpctoolkit_dataframe_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u == v:  # operator contract: self-loops carry no connectivity
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id of the component
    comp_min = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, r), x)
    return {x: comp_min[find(x)] for x in parent}


def _run(spark, edges, small_input_rows=0):
    # small_input_rows=0 forces the distributed star-contraction path
    df = spark.createDataFrame(edges, "u: long, v: long")
    got = {(r["node"], r["component"])
           for r in connected_components(
               df, small_input_rows=small_input_rows).collect()}
    want = set(_union_find(0, edges).items())
    assert got == want


def test_empty(spark):
    df = spark.createDataFrame([], "u: long, v: long")
    assert connected_components(df).count() == 0


def test_chain_graph(spark):
    # worst case for label propagation: one long path; star-contraction
    # must still converge within MAX_ROUNDS
    n = 200
    _run(spark, [(i, i + 1) for i in range(n)])


def test_self_loops_and_duplicates(spark):
    _run(spark, [(1, 1), (2, 3), (3, 2), (2, 3), (7, 7)])


def test_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(6):
        n = rng.randint(2, 120)
        m = rng.randint(1, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        _run(spark, edges)


def test_two_cliques_bridge(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _run(spark, a + b + [(4, 10)])


def test_driver_fast_path_matches_distributed(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(150)]
    _run(spark, edges, small_input_rows=100_000)  # fast path
    _run(spark, edges, small_input_rows=0)        # distributed


@pytest.fixture(scope="module")
def clusters(spark):
    return REGISTRY["dedup_clusters"].fn(spark, SF_DIR).collect()


def test_dedup_clusters_covers_all_docs(spark, clusters):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(clusters) == n_docs
    assert len({r["doc_id"] for r in clusters}) == n_docs


def test_dedup_clusters_canonical_invariants(clusters):
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        # representative is the member minimum and is flagged canonical
        assert cid == min(r["doc_id"] for r in rows)
        assert sum(r["is_canonical"] for r in rows) == 1
        assert all(r["cluster_size"] == len(rows) for r in rows)


def test_dedup_clusters_consistent_with_pairs(spark, clusters):
    label = {r["doc_id"]: r["cluster_id"] for r in clusters}
    pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, SF_DIR).collect()
    for p in pairs:
        assert label[p["doc_a"]] == label[p["doc_b"]]


def test_cct_hot_regions_disjoint_connected(spark):
    """cct_hot_regions must produce MULTIPLE regions (the ratio-of-parent
    criterion is non-monotone — a raw-value threshold would always give
    one root-anchored component), each labeled by its minimum member id,
    internally connected through parent edges, and with consistent
    size/value aggregates."""
    from hpctoolkit_dataframe_spark.queries.cct_tpch import build_cct

    out = REGISTRY["cct_hot_regions"].fn(spark, SF_DIR).collect()
    assert out
    by_region = {}
    for r in out:
        by_region.setdefault(r["region_id"], []).append(r)
    assert len(by_region) >= 2  # genuinely disjoint regions

    cct = {r["id"]: r for r in
           build_cct(spark, SF_DIR).select("id", "parent_id", "value")
           .collect()}
    for rid, rows in by_region.items():
        ids = {r["id"] for r in rows}
        assert rid == min(ids)
        assert all(r["region_size"] == len(rows) for r in rows)
        assert all(r["region_value"] == sum(cct[i]["value"] for i in ids)
                   for r in rows)
        # internally connected under parent edges restricted to members
        labels = _union_find(0, [(i, cct[i]["parent_id"]) for i in ids
                                 if cct[i]["parent_id"] in ids])
        roots = {labels.get(i, i) for i in ids}
        assert len(roots) == 1, (rid, sorted(ids))


def test_embedding_dup_clusters_consistent_with_pairs(spark):
    labels = {r["vec_id"]: r["cluster_id"]
              for r in REGISTRY["embedding_dup_clusters"]
              .fn(spark, SF_DIR).collect()}
    pairs = REGISTRY["lsh_near_dup_pairs"].fn(spark, SF_DIR).collect()
    assert labels  # the fixture data does contain near-dups
    for p in pairs:
        assert labels[p["vec_a"]] == labels[p["vec_b"]]
    # every label is the minimum of its member set
    members = {}
    for v, c in labels.items():
        members.setdefault(c, []).append(v)
    for c, vs in members.items():
        assert c == min(vs)
