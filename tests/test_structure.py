"""Exactness pins for operators/structure.py and operators/ktruss.py:
independent dense-numpy / pure-python oracles on the canonical fixtures
(karate club + toys), mirroring the kcore/triangles test strategy."""

import math

import numpy as np
import pytest

from linkgraph.operators.ktruss import k_truss
from linkgraph.operators.structure import (
    adamic_adar,
    clustering_coefficients,
    degree_assortativity,
    reciprocity,
)
from tests import conftest as fx


def _adj(src, dst, n):
    A = np.zeros((n, n), dtype=np.int64)
    for u, v in zip(src, dst):
        if u != v:
            A[u, v] = 1
            A[v, u] = 1
    return A


# ---------------- clustering coefficients ----------------


def test_clustering_karate_vs_dense_numpy(spark):
    # independent formulation: T(v) = diag(A^3)/2 on the 0/1 adjacency
    src, dst, n = fx.karate_club()
    A = _adj(src, dst, n)
    tri = np.diag(np.linalg.matrix_power(A, 3)) // 2
    deg = A.sum(axis=1)
    lcc = np.where(deg >= 2, 2.0 * tri / np.maximum(deg * (deg - 1), 1), 0.0)

    df = fx.edges_df(spark, src, dst)
    got = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert set(got) == set(range(n))
    for v in range(n):
        assert got[v]["deg"] == deg[v]
        assert got[v]["triangles"] == tri[v]
        assert abs(got[v]["lcc"] - lcc[v]) < 1e-12


def test_clustering_triangle_free_graph_is_zero(spark):
    src, dst, n = fx.two_components()  # two directed cycles of length 5
    df = fx.edges_df(spark, src, dst)
    rows = clustering_coefficients(df).collect()
    assert len(rows) == n
    assert all(r["triangles"] == 0 and r["lcc"] == 0.0 for r in rows)


# ---------------- Adamic-Adar ----------------


def test_adamic_adar_path_hand_computed(spark):
    # path 0-1-2: the only non-adjacent wedge pair is (0,2) through 1 (deg 2)
    df = fx.edges_df(spark, [0, 1], [1, 2])
    rows = adamic_adar(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (0, 2)
    assert abs(r["aa"] - 1.0 / math.log(2)) < 1e-12


def test_adamic_adar_square_hand_computed(spark):
    # 4-cycle 0-1-2-3-0: diagonals (0,2) and (1,3) each share two deg-2
    # neighbors -> AA = 2/ln 2; adjacent pairs are excluded
    df = fx.edges_df(spark, [0, 1, 2, 3], [1, 2, 3, 0])
    got = {(r["a"], r["b"]): r["aa"] for r in adamic_adar(df).collect()}
    assert set(got) == {(0, 2), (1, 3)}
    for v in got.values():
        assert abs(v - 2.0 / math.log(2)) < 1e-12


def test_adamic_adar_karate_vs_numpy(spark):
    src, dst, n = fx.karate_club()
    A = _adj(src, dst, n)
    deg = A.sum(axis=1)
    expected = {}
    for a in range(n):
        for b in range(a + 1, n):
            if A[a, b]:
                continue
            common = np.flatnonzero(A[a] & A[b])
            if len(common):
                expected[(a, b)] = float(np.sum(1.0 / np.log(deg[common])))
    df = fx.edges_df(spark, src, dst)
    got = {(r["a"], r["b"]): r["aa"] for r in adamic_adar(df).collect()}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-9


def test_link_prediction_karate_vs_numpy(spark):
    from linkgraph.operators.structure import link_prediction

    src, dst, n = fx.karate_club()
    A = _adj(src, dst, n)
    deg = A.sum(axis=1)
    expected = {}
    for a in range(n):
        for b in range(a + 1, n):
            if A[a, b]:
                continue
            common = np.flatnonzero(A[a] & A[b])
            if len(common):
                cn = len(common)
                expected[(a, b)] = (
                    cn,
                    cn / (deg[a] + deg[b] - cn),
                    float(np.sum(1.0 / np.log(deg[common]))),
                    float(np.sum(1.0 / deg[common])),
                )
    df = fx.edges_df(spark, src, dst)
    got = {
        (r["a"], r["b"]): (r["cn"], r["jaccard"], r["aa"], r["ra"])
        for r in link_prediction(df).collect()
    }
    assert set(got) == set(expected)
    for k, (cn, jac, aa, ra) in expected.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - jac) < 1e-12
        assert abs(got[k][2] - aa) < 1e-9
        assert abs(got[k][3] - ra) < 1e-12


def test_adamic_adar_max_degree_drops_hub_wedges(spark):
    # star: 1..5 -> 0; every spoke pair shares only the hub (deg 5), so
    # capping max_degree below 5 empties the candidate set
    src = [1, 2, 3, 4, 5]
    dst = [0, 0, 0, 0, 0]
    df = fx.edges_df(spark, src, dst)
    assert adamic_adar(df).count() == 10  # C(5,2) spoke pairs via the hub
    assert adamic_adar(df, max_degree=4).count() == 0


# ---------------- reciprocity ----------------


def test_reciprocity_hand_computed(spark):
    # a->b, b->a, a->c : 2 of 3 directed simple edges reciprocated
    df = fx.edges_df(spark, [0, 1, 0], [1, 0, 2])
    r = reciprocity(df).first()
    assert (r["reciprocated"], r["total"]) == (2, 3)
    assert abs(r["reciprocity"] - 2.0 / 3.0) < 1e-12


def test_reciprocity_ignores_self_loops_and_multiedges(spark):
    src, dst, n = fx.multi_edge()  # dup (0,1)x2, (0,2),(1,2),(2,0), loop (2,2)
    df = fx.edges_df(spark, src, dst)
    r = reciprocity(df).first()
    # simple digraph: {01,02,12,20}; reciprocated: 02 & 20
    assert (r["reciprocated"], r["total"]) == (2, 4)


def test_reciprocity_symmetrized_graph_is_one(spark):
    src, dst, n = fx.karate_club()  # fixture carries both directions
    df = fx.edges_df(spark, src, dst)
    r = reciprocity(df).first()
    assert r["reciprocity"] == 1.0


# ---------------- assortativity ----------------


def test_assortativity_karate_vs_numpy_corr(spark):
    src, dst, n = fx.karate_club()
    A = _adj(src, dst, n)
    deg = A.sum(axis=1)
    us, vs = np.nonzero(A)  # ordered ends, both directions
    expected = np.corrcoef(deg[us], deg[vs])[0, 1]
    df = fx.edges_df(spark, src, dst)
    got = degree_assortativity(df).first()["assortativity"]
    assert abs(got - expected) < 1e-9
    assert got < 0  # karate is famously disassortative (~ -0.4756)


def test_assortativity_regular_graph_is_degenerate(spark):
    # cycle: all degrees equal -> zero variance -> corr undefined (NULL)
    src, dst, n = fx.toy_cycle()
    df = fx.edges_df(spark, src, dst)
    assert degree_assortativity(df).first()["assortativity"] is None


# ---------------- avg neighbor degree / knn curve ----------------


def test_avg_neighbor_degree_karate_vs_numpy(spark):
    from linkgraph.operators.structure import avg_neighbor_degree

    src, dst, n = fx.karate_club()
    A = _adj(src, dst, n)
    deg = A.sum(axis=1)
    df = fx.edges_df(spark, src, dst)
    got = {r["node"]: r for r in avg_neighbor_degree(df).collect()}
    assert set(got) == set(range(n))
    for v in range(n):
        nbrs = np.flatnonzero(A[v])
        assert got[v]["deg"] == deg[v]
        assert abs(got[v]["avg_nbr_deg"] - deg[nbrs].mean()) < 1e-12


def test_knn_curve_star_hand_computed(spark):
    from linkgraph.operators.structure import knn_curve

    # star: hub deg 4 sees avg 1.0; each spoke deg 1 sees avg 4.0
    df = fx.edges_df(spark, [1, 2, 3, 4], [0, 0, 0, 0])
    rows = {r["deg"]: r for r in knn_curve(df).collect()}
    assert rows[4]["n_nodes"] == 1 and rows[4]["knn"] == 1.0
    assert rows[1]["n_nodes"] == 4 and rows[1]["knn"] == 4.0


# ---------------- global metrics ----------------


def test_transitivity_karate_vs_numpy(spark):
    from linkgraph.operators.structure import transitivity

    src, dst, n = fx.karate_club()
    A = _adj(src, dst, n)
    tri = int(np.trace(np.linalg.matrix_power(A, 3)) // 6)
    deg = A.sum(axis=1)
    wedges = int((deg * (deg - 1) // 2).sum())
    r = transitivity(fx.edges_df(spark, src, dst)).first()
    assert (r["triangles"], r["wedges"]) == (tri, wedges)
    assert abs(r["transitivity"] - 3.0 * tri / wedges) < 1e-12
    assert abs(r["transitivity"] - 0.2556818181818182) < 1e-12  # known value


def test_transitivity_triangle_free_is_zero(spark):
    from linkgraph.operators.structure import transitivity

    src, dst, n = fx.two_components()  # two 5-cycles: wedges but no triangle
    r = transitivity(fx.edges_df(spark, src, dst)).first()
    assert r["triangles"] == 0 and r["transitivity"] == 0.0


def test_powerlaw_alpha_hand_computed(spark):
    import math

    from linkgraph.operators.structure import powerlaw_alpha

    # star 1..5 -> 0: hub deg 5, spokes deg 1; tail (d_min=2) = {hub}
    r = powerlaw_alpha(
        fx.edges_df(spark, [1, 2, 3, 4, 5], [0, 0, 0, 0, 0]), d_min=2
    ).first()
    assert r["n_tail"] == 1
    assert abs(r["alpha"] - (1.0 + 1.0 / math.log(5 / 1.5))) < 1e-12


def test_rich_club_hand_computed(spark):
    from linkgraph.operators.structure import rich_club

    # K3 on {0,1,2} (deg 2) + pendant 2-3 (node 2 deg 3, node 3 deg 1)
    df = fx.edges_df(spark, [0, 0, 1, 2], [1, 2, 2, 3])
    rows = {r["k"]: r for r in rich_club(df).collect()}
    # k=1: nodes {0,1,2} (deg>1), edges among them = 3 -> phi = 1.0
    assert (rows[1]["n_nodes"], rows[1]["n_edges"]) == (3, 3)
    assert rows[1]["phi"] == 1.0
    # k=2: only node 2 -> filtered (n_nodes < 2); k=3: none
    assert set(rows) == {1}


# ---------------- k-truss ----------------


def _ktruss_python(src, dst, n, k):
    """Independent pure-python peel on the simple undirected graph."""
    edges = set()
    for u, v in zip(src, dst):
        if u != v:
            edges.add((min(u, v), max(u, v)))
    while True:
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        drop = {
            (a, b) for a, b in edges if len(nbrs[a] & nbrs[b]) < k - 2
        }
        if not drop:
            return sorted(edges)
        edges -= drop


@pytest.mark.parametrize("k", [3, 4, 5, 6])
def test_ktruss_karate_matches_python_peel(spark, k):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    got = sorted((r["a"], r["b"]) for r in k_truss(df, k).collect())
    assert got == _ktruss_python(src, dst, n, k)


def test_ktruss_k4_plus_pendant(spark):
    # K4 on {0,1,2,3} + pendant edge 3-4: the 4-truss is exactly the K4
    # (every K4 edge has 2 common neighbors); the 5-truss is empty
    src = [0, 0, 0, 1, 1, 2, 3]
    dst = [1, 2, 3, 2, 3, 3, 4]
    df = fx.edges_df(spark, src, dst)
    got = k_truss(df, 4).collect()
    assert sorted((r["a"], r["b"]) for r in got) == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    ]
    assert all(r["support"] == 2 for r in got)
    assert k_truss(df, 5).count() == 0


def test_ktruss_2truss_is_all_edges_with_support(spark):
    src, dst, n = fx.multi_edge()
    df = fx.edges_df(spark, src, dst)
    rows = {(r["a"], r["b"]): r["support"] for r in k_truss(df, 2).collect()}
    # simple undirected edges of multi_edge: 01, 02, 12 — a triangle
    assert rows == {(0, 1): 1, (0, 2): 1, (1, 2): 1}


# ---- modularity (Newman-Girvan, community-summed form) ----

def test_modularity_matches_networkx_or_formula(spark):
    from linkgraph.operators.structure import modularity_by_label

    src, dst, n = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    # the historical two-faction split of the club
    faction1 = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17, 19, 21}
    labels = spark.createDataFrame(
        [(v, 1 if v in faction1 else 2) for v in range(n)], "node long, label int"
    )
    rows = modularity_by_label(e, labels).collect()
    q = sum(r["contrib"] for r in rows)
    # formula replica
    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    m = len(und)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    lab = {v: (1 if v in faction1 else 2) for v in range(n)}
    want = 0.0
    for c in (1, 2):
        intra = sum(1 for a, b in und if lab[a] == c and lab[b] == c)
        degc = sum(d for v, d in deg.items() if lab[v] == c)
        want += intra / m - (degc / (2 * m)) ** 2
    assert q == pytest.approx(want, abs=1e-12)
    assert 0.3 < q < 0.45  # the known ~0.36 for the faction split
    nx = pytest.importorskip("networkx")
    G = nx.Graph(list(und))
    want_nx = nx.community.modularity(
        G, [set(v for v in lab if lab[v] == c) for c in (1, 2)]
    )
    assert q == pytest.approx(want_nx, abs=1e-9)


def test_modularity_extremes(spark):
    from linkgraph.operators.structure import modularity_by_label

    src, dst, n = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    # one community: Q = 1 - 1 = 0 exactly
    one = spark.createDataFrame([(v, 0) for v in range(n)], "node long, label int")
    rows = modularity_by_label(e, one).collect()
    assert len(rows) == 1
    assert rows[0]["contrib"] == pytest.approx(0.0, abs=1e-12)
    # singleton communities: no intra edges, Q < 0
    sing = spark.createDataFrame([(v, v) for v in range(n)], "node long, label long")
    q = sum(r["contrib"] for r in modularity_by_label(e, sing).collect())
    assert q < 0


# ---- truss decomposition (h-index fixpoint over triangle incidence) ----

def test_trussness_agrees_with_ktruss_peel(spark):
    from linkgraph.operators.ktruss import truss_decomposition

    src, dst, _ = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    td = {(r["a"], r["b"]): r["trussness"] for r in truss_decomposition(e).collect()}
    assert max(td.values()) == 5  # karate's known max truss
    for k in (3, 4, 5, 6):
        peel = {(r["a"], r["b"]) for r in k_truss(e, k).collect()}
        assert {ab for ab, t in td.items() if t >= k} == peel, k


def test_trussness_rounds_monotone_and_support_init(spark):
    from linkgraph.operators.ktruss import edge_support, truss_decomposition, _canonical

    src, dst, _ = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    prev = None
    for r in range(3):
        t = {
            (row["a"], row["b"]): row["trussness"]
            for row in truss_decomposition(e, fixed_rounds=r).collect()
        }
        if prev is not None:
            assert all(t[k] <= prev[k] for k in t)
        prev = t
    sup = {
        (r["a"], r["b"]): r["support"]
        for r in edge_support(_canonical(e)).collect()
    }
    t0 = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(e, fixed_rounds=0).collect()
    }
    assert t0 == {k: v + 2 for k, v in sup.items()}


def test_trussness_triangle_free(spark):
    from linkgraph.operators.ktruss import truss_decomposition

    src, dst, _ = fx.toy_chain_dangling()
    t = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(fx.edges_df(spark, src, dst)).collect()
    }
    assert set(t.values()) == {2}  # every edge exactly the trivial 2-truss


# ---- conductance (Kannan-Vempala-Vetta cluster quality) ----

def test_conductance_matches_replica_and_networkx(spark):
    from linkgraph.operators.structure import conductance_by_label

    src, dst, n = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    faction1 = {0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 16, 17, 19, 21}
    labels = spark.createDataFrame(
        [(v, 1 if v in faction1 else 2) for v in range(n)], "node long, label int"
    )
    rows = {r["label"]: r for r in conductance_by_label(e, labels).collect()}
    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    lab = {v: (1 if v in faction1 else 2) for v in range(n)}
    m2 = 2 * len(und)
    for c in (1, 2):
        cut = sum(1 for a, b in und if lab[a] != lab[b])
        vol = sum(d for v, d in deg.items() if lab[v] == c)
        assert rows[c]["cut_edges"] == cut
        assert rows[c]["vol"] == vol
        assert rows[c]["conductance"] == pytest.approx(
            cut / min(vol, m2 - vol), abs=1e-12
        )
    nx = pytest.importorskip("networkx")
    G = nx.Graph(list(und))
    s1 = {v for v in lab if lab[v] == 1}
    assert rows[1]["conductance"] == pytest.approx(
        nx.conductance(G, s1), abs=1e-9
    )


def test_conductance_extremes(spark):
    from linkgraph.operators.structure import conductance_by_label

    # two triangles joined by a single bridge edge (2-5)
    src = [0, 1, 2, 3, 4, 5, 2]
    dst = [1, 2, 0, 4, 5, 3, 5]
    e = fx.edges_df(spark, src, dst)
    half = spark.createDataFrame(
        [(v, 1 if v < 3 else 2) for v in range(6)], "node long, label int"
    )
    rows = {r["label"]: r for r in conductance_by_label(e, half).collect()}
    # each triangle: vol = 2+2+3 = 7, cut = 1, 2m = 14 -> phi = 1/7
    for c in (1, 2):
        assert rows[c]["cut_edges"] == 1
        assert rows[c]["vol"] == 7
        assert rows[c]["conductance"] == pytest.approx(1 / 7, abs=1e-12)
    # one community owning everything: denominator 0 -> NULL
    one = spark.createDataFrame(
        [(v, 1) for v in range(6)], "node long, label int"
    )
    row = conductance_by_label(e, one).collect()
    assert len(row) == 1 and row[0]["cut_edges"] == 0
    assert row[0]["conductance"] is None


# ---- squares (global 4-cycle census) ----

def _brute_squares(und_pairs):
    from itertools import combinations

    adj = {}
    for a, b in und_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    count = 0
    for quad in combinations(nodes, 4):
        # a labeled 4-cycle on 4 vertices exists for each of the 3
        # pairings of opposite vertices whose 4 rim edges all exist
        u, v, x, y = quad
        # one labeled 4-cycle per opposite-pairing whose rim edges
        # p-r, r-q, q-s, s-p all exist
        for (p, q), (r, s) in (
            ((u, v), (x, y)),
            ((u, x), (v, y)),
            ((u, y), (v, x)),
        ):
            if (
                r in adj[p]
                and q in adj[r]
                and s in adj[q]
                and p in adj[s]
            ):
                count += 1
    return count


def test_square_count_golden_and_brute(spark):
    from linkgraph.operators.structure import square_count

    # C4 itself: exactly one square
    e = fx.edges_df(spark, [0, 1, 2, 3], [1, 2, 3, 0])
    row = square_count(e).collect()[0]
    assert row["square_count"] == 1
    # K4: 3 squares; K5: 15 (3 * C(n, 4))
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = square_count(
        fx.edges_df(spark, [a for a, _ in k4], [b for _, b in k4])
    ).collect()[0]
    assert row["square_count"] == 3
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    row = square_count(
        fx.edges_df(spark, [a for a, _ in k5], [b for _, b in k5])
    ).collect()[0]
    assert row["square_count"] == 15
    # triangle: none
    row = square_count(fx.edges_df(spark, [0, 1, 2], [1, 2, 0])).collect()[0]
    assert row["square_count"] == 0
    # karate vs brute force
    src, dst, _ = fx.karate_club()
    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst)}
    row = square_count(fx.edges_df(spark, src, dst)).collect()[0]
    assert row["square_count"] == _brute_squares(und)


# ---- bipartite projection ----

def test_project_bipartite_hand_computed(spark):
    from linkgraph.operators.structure import project_bipartite

    # users 1,2,3 -> items 10,11,12: u1 {10,11}, u2 {10,11,12}, u3 {12}
    e = fx.edges_df(spark, [1, 1, 2, 2, 2, 3], [10, 11, 10, 11, 12, 12])
    got = {(r["a"], r["b"]): r["w"] for r in project_bipartite(e).collect()}
    assert got == {(1, 2): 2, (2, 3): 1}
    # min_weight prunes the weak tie
    got2 = {
        (r["a"], r["b"]): r["w"]
        for r in project_bipartite(e, min_weight=2).collect()
    }
    assert got2 == {(1, 2): 2}
    # item-side projection: 10~11 share {1,2}; 11~12 and 10~12 share {2}
    got3 = {
        (r["a"], r["b"]): r["w"]
        for r in project_bipartite(e, side="dst").collect()
    }
    assert got3 == {(10, 11): 2, (10, 12): 1, (11, 12): 1}
    # duplicate interaction rows do not inflate weights
    e2 = fx.edges_df(
        spark, [1, 1, 1, 2, 2, 2, 2, 3], [10, 10, 11, 10, 11, 12, 12, 12]
    )
    got4 = {(r["a"], r["b"]): r["w"] for r in project_bipartite(e2).collect()}
    assert got4 == got


def test_square_count_wedge_free_is_zero(spark):
    from linkgraph.operators.structure import square_count

    # perfect matching: no wedges at all -> empty cn table, count 0 not NULL
    row = square_count(fx.edges_df(spark, [0, 2], [1, 3])).collect()[0]
    assert row["square_count"] == 0 and row["n_pairs"] == 0


def test_conductance_all_isolated_label_keeps_row(spark):
    from linkgraph.operators.structure import conductance_by_label

    e = fx.edges_df(spark, [0], [1])
    labels = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2)], "node long, label int"
    )
    rows = {r["label"]: r for r in conductance_by_label(e, labels).collect()}
    assert set(rows) == {1, 2}  # the isolated-only label still appears
    assert rows[2]["vol"] == 0 and rows[2]["cut_edges"] == 0
    assert rows[2]["conductance"] is None


def test_project_bipartite_pivot_degree_cap(spark):
    from linkgraph.operators.structure import project_bipartite

    # pivot 10 shared by 3 users (the "hub" event), 11 by 2, 12 by 1
    e = fx.edges_df(spark, [1, 2, 3, 1, 2, 3], [10, 10, 10, 11, 11, 12])
    exact = {(r["a"], r["b"]): r["w"] for r in project_bipartite(e).collect()}
    assert exact == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # non-binding cap == exact
    capped = {
        (r["a"], r["b"]): r["w"]
        for r in project_bipartite(e, max_pivot_degree=3).collect()
    }
    assert capped == exact
    # binding cap drops the hub pivot's wedges only
    capped2 = {
        (r["a"], r["b"]): r["w"]
        for r in project_bipartite(e, max_pivot_degree=2).collect()
    }
    assert capped2 == {(1, 2): 1}
    with pytest.raises(ValueError):
        project_bipartite(e, max_pivot_degree=0)


def test_square_count_doulion_p1_exact_and_deterministic(spark):
    from linkgraph.operators.structure import square_count, square_count_doulion

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    e = fx.edges_df(spark, [a for a, _ in k5], [b for _, b in k5])
    row = square_count_doulion(e, p=1.0).collect()[0]
    assert row["sampled_squares"] == 15 and row["square_estimate"] == 15.0
    assert row["kept_edges"] == 10
    # deterministic + repartition-stable at p<1
    r1 = square_count_doulion(e, p=0.7).collect()[0]
    r2 = square_count_doulion(e.repartition(7), p=0.7).collect()[0]
    assert (r1["kept_edges"], r1["sampled_squares"]) == (
        r2["kept_edges"], r2["sampled_squares"])
    assert r1["square_estimate"] == pytest.approx(
        r1["sampled_squares"] / 0.7**4, abs=1e-6)
    # direction-symmetric coin: reversing edges keeps the same sample
    rev = fx.edges_df(spark, [b for _, b in k5], [a for a, _ in k5])
    r3 = square_count_doulion(rev, p=0.7).collect()[0]
    assert r3["kept_edges"] == r1["kept_edges"]
    assert r3["sampled_squares"] == r1["sampled_squares"]
    with pytest.raises(ValueError):
        square_count_doulion(e, p=0.0)


def test_square_count_doulion_estimator_tracks_exact(spark):
    """On a dense-ish graph the p=0.8 estimate lands within a loose
    relative band of the exact census (variance bound sanity, not a
    statistical test — the coin is deterministic)."""
    from linkgraph.operators.structure import square_count, square_count_doulion

    src, dst, _ = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    exact = square_count(e).collect()[0]["square_count"]
    est = square_count_doulion(e, p=0.8).collect()[0]["square_estimate"]
    assert exact > 0
    assert abs(est / exact - 1) < 0.6
