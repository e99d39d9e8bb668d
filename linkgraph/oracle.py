"""Numpy reference oracles — the trusted serial baselines tests diff against.

``pagerank_family_a`` reproduces the reference's "custom" PageRank semantics
exactly (reference: /root/reference/pagerank_implementations/pagerank_custom.h:59-96):

* init rank = 1/n for every vertex          (helpers/helper.h:52-58)
* per iteration (damping d, default 0.85, global_config.h:7):
    leaked     = sum of old rank over dangling vertices (out_degree == 0)
                                              (pagerank_custom.h:70-76)
    base_total = leaked + (1 - leaked) * (1 - d)   == (1-d) + d*leaked
    base       = base_total / n
    new[i]     = base + sum_{j in in(i)} d * old[j] / outdeg[j]
                                              (pagerank_custom.h:80-87)
* stop when L2 norm sqrt(sum (new-old)^2) <= eps  (helpers/helper.h:12-22)
  or after max_iter iterations               (global_config.h:8-10)

Multi-edges and self-loops are kept — a duplicated (u,v) contributes twice
and bumps outdeg(u) twice (helpers/file_helper.h:74-83, SURVEY §1.4).
"""

from __future__ import annotations

import numpy as np


def pagerank_family_a(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    d: float = 0.85,
    eps: float = 1e-6,
    max_iter: int = 200,
) -> tuple[np.ndarray, int]:
    """Exact Family-A power iteration. src/dst are dense int ids in [0, n)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0.0
    # per-edge weight 1/outdeg(src) — the COO data[] (mtx_sparse.h:123-132)
    w = 1.0 / outdeg[src]
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    iters = 0
    for iters in range(1, max_iter + 1):
        leaked = rank[dangling].sum()
        base = (leaked + (1.0 - leaked) * (1.0 - d)) / n
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, rank[src] * w)
        new = base + d * contrib
        norm = float(np.sqrt(((new - rank) ** 2).sum()))
        rank = new
        if norm <= eps:
            break
    return rank, iters


def pagerank_personalized(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    sources: np.ndarray,
    d: float = 0.85,
    eps: float = 1e-6,
    max_iter: int = 200,
) -> tuple[np.ndarray, int]:
    """Personalized PageRank: teleport AND leaked dangling mass return to
    the uniform distribution over `sources` (v), not to all vertices:

        new = d*(M r + leaked*v) + (1-d)*v

    Same L2 stop rule as Family A. Reduces to Family A when sources =
    all vertices."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    v = np.zeros(n, dtype=np.float64)
    v[np.asarray(sources, dtype=np.int64)] = 1.0 / len(sources)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0.0
    w = 1.0 / outdeg[src]
    rank = v.copy()
    iters = 0
    for iters in range(1, max_iter + 1):
        leaked = rank[dangling].sum()
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, rank[src] * w)
        new = d * (contrib + leaked * v) + (1.0 - d) * v
        norm = float(np.sqrt(((new - rank) ** 2).sum()))
        rank = new
        if norm <= eps:
            break
    return rank, iters


def pagerank_family_b(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    d: float = 0.85,
    eps: float = 1e-6,
    max_iter: int = 200,
) -> tuple[np.ndarray, int]:
    """Family-B ("mtx/OCL") semantics (SURVEY §2.8): per iteration
    new = (1-d)/n + d*(M·old) with NO dangling-mass redistribution — mass
    leaks through dangling vertices — followed by ONE final
    sum-normalization pr /= Σpr after the loop.
    (reference: /root/reference/kernels/sparse_matrix.cl:8-18 fixPROutput;
    /root/reference/pagerank_OCL.h:120-121,156-161). On dangling graphs this
    differs from Family A at any FIXED iteration count (the reference's
    production config: CHECK_CONVERGENCE=0, 200 iterations) — though at full
    convergence the normalized fixed points provably coincide."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    w = 1.0 / outdeg[src]
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    iters = 0
    for iters in range(1, max_iter + 1):
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, rank[src] * w)
        new = (1.0 - d) / n + d * contrib
        norm = float(np.sqrt(((new - rank) ** 2).sum()))
        rank = new
        if norm <= eps:
            break
    return rank / rank.sum(), iters


def connected_components(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Undirected connected components; label = min vertex id in component."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64)):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    # normalize: label = min id in component (root chains always point down)
    return roots


def label_propagation(
    src: np.ndarray, dst: np.ndarray, n: int, max_iter: int = 10
) -> np.ndarray:
    """Synchronous LPA on the simple undirected view (multi-edges deduped,
    self-loops dropped — matching operators/lpa.py which uses symmetrize()).
    Deterministic: every node takes the most frequent label among its
    neighbors; ties broken by smaller label; nodes with no neighbors keep
    their own label. Fixed iteration count with early stop at fixpoint."""
    pairs = {
        (int(a), int(b))
        for a, b in zip(np.asarray(src, np.int64), np.asarray(dst, np.int64))
        if a != b
    }
    pairs |= {(b, a) for a, b in pairs}
    s = np.array([a for a, b in sorted(pairs)], dtype=np.int64)
    t = np.array([b for a, b in sorted(pairs)], dtype=np.int64)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        new = labels.copy()
        neigh_lab = labels[t]
        for v in range(n):
            mask = s == v
            if not mask.any():
                continue
            labs, counts = np.unique(neigh_lab[mask], return_counts=True)
            best = labs[counts == counts.max()].min()
            new[v] = best
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangle_count(src: np.ndarray, dst: np.ndarray, n: int) -> int:
    """Total triangle count of the simple undirected view (dedupe multi-edges,
    drop self-loops), via degree-ordered orientation + wedge closure."""
    s = np.asarray(src, np.int64)
    t = np.asarray(dst, np.int64)
    keep = s != t
    s, t = s[keep], t[keep]
    und = set()
    for u, v in zip(s, t):
        und.add((min(int(u), int(v)), max(int(u), int(v))))
    deg = np.zeros(n, dtype=np.int64)
    for u, v in und:
        deg[u] += 1
        deg[v] += 1

    def lt(a: int, b: int) -> bool:
        return (deg[a], a) < (deg[b], b)

    adj: list[list[int]] = [[] for _ in range(n)]
    edge_set = und
    for u, v in und:
        if lt(u, v):
            adj[u].append(v)
        else:
            adj[v].append(u)
    count = 0
    for u in range(n):
        out = adj[u]
        for i in range(len(out)):
            for j in range(i + 1, len(out)):
                a, b = out[i], out[j]
                if (min(a, b), max(a, b)) in edge_set:
                    count += 1
    return count
