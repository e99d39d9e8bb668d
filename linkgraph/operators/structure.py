"""Structural graph statistics: local clustering coefficients, Adamic-Adar
link prediction, reciprocity, and degree assortativity.

North-rule extensions (no reference implementation exists — the reference is
PageRank-only, /root/reference/src/pagerank_custom.h): these are the standard
companions of the §2.9 triangle/LPA/components family for link-graph
analytics, expressed as pure Catalyst plans (joins + aggregates, zero Python
in the hot path).

Scale posture:
* clustering_coefficients reuses the degree-ordered triangle orientation
  (operators/triangles.py — Suri & Vassilvitskii WWW'11), so the wedge
  self-join stays O(m^1.5) even on power-law graphs.
* adamic_adar enumerates wedges keyed by the COMMON neighbor z — the join
  fan-out is Σ_z deg(z)^2, which a hub dominates; `max_degree` caps z's
  degree exactly like the standard "drop super-hubs" mitigation (a hub that
  everyone shares carries ~1/ln(deg) ≈ 0 signal anyway, so the cap is also
  statistically principled). At 100 TB you'd set max_degree ~ 10^3-10^4 and
  the wedge table stays linear-ish in m.
* reciprocity / assortativity are one self-join + one aggregate each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize
from linkgraph.operators.triangles import triangles_per_vertex


def simple_degrees(edges: DataFrame) -> DataFrame:
    """[node, deg] on the simple undirected view (multi-edges deduped,
    self-loops dropped)."""
    return symmetrize(edges).groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex on the simple undirected
    graph: lcc(v) = 2·T(v) / (deg(v)·(deg(v)-1)), 0 when deg < 2.

    Plan: triangle counts come from the degree-ordered wedge join
    (triangles.py), degrees from one groupBy on the symmetrized edge list,
    then a left join — vertices in no triangle get T = 0. Returns
    [node, deg, triangles, lcc].
    """
    deg = simple_degrees(edges)
    tri = triangles_per_vertex(edges)
    return deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce(F.col("triangles"), F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )


def link_prediction(
    edges: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """The four classical common-neighbor link-prediction scores for
    NON-adjacent pairs (a, b), a < b, sharing at least one neighbor on the
    simple undirected graph (Liben-Nowell & Kleinberg, CIKM'03 survey):

        cn(a, b)  = |N(a) ∩ N(b)|                 (common neighbors)
        jac(a, b) = cn / |N(a) ∪ N(b)|            (Jaccard)
        aa(a, b)  = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z) (Adamic-Adar)
        ra(a, b)  = Σ_{z ∈ N(a)∩N(b)} 1/deg(z)    (resource allocation,
                                                   Zhou-Lü-Zhang EPJ-B 2009)

    Plan: ONE wedge enumeration keyed by the common neighbor z
    (und(z→a) ⋈ und(z→b), a < b) with z's weights (1/ln deg, 1/deg) joined
    in BEFORE the pair groupBy, so all four sums ride a single shuffle on
    (a, b); existing edges removed with a left-anti join against the
    canonical a<b edge set; two final degree joins supply |N(a) ∪ N(b)| =
    deg(a) + deg(b) − cn for Jaccard. A common neighbor necessarily has
    deg(z) ≥ 2 (its single neighbor yields no a<b pair), so the deg ≥ 2
    filter on z is semantically free and keeps 1/ln(deg) away from
    ln(1) = 0 under ANSI mode. `max_degree` (optional) additionally drops
    super-hub common neighbors to bound the wedge fan-out Σ_z deg(z)² at
    scale — the standard mitigation, and statistically principled: a hub
    everyone shares carries ~1/ln(deg) ≈ 0 signal. Returns
    [a, b, cn, jaccard, aa, ra].
    """
    und = symmetrize(edges)
    deg = simple_degrees(edges)
    degz = deg.filter(F.col("deg") >= 2)
    if max_degree is not None:
        degz = degz.filter(F.col("deg") <= max_degree)
    # neighbor lists keyed by z, carrying z's inverse-log / inverse degree
    nz = und.select(F.col("src").alias("z"), F.col("dst").alias("nbr")).join(
        degz.select(
            F.col("node").alias("z"),
            (1.0 / F.log("deg")).alias("wa"),
            (1.0 / F.col("deg")).alias("wr"),
        ),
        "z",
    )
    left = nz.select("z", F.col("nbr").alias("a"), "wa", "wr")
    right = nz.select("z", F.col("nbr").alias("b"))
    pairs = left.join(right, "z").filter(F.col("a") < F.col("b"))
    canon = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    scores = (
        pairs.join(canon, ["a", "b"], "left_anti")
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("cn"),
            F.sum("wa").alias("aa"),
            F.sum("wr").alias("ra"),
        )
    )
    return (
        scores.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")),
            "b",
        )
        .select(
            "a",
            "b",
            "cn",
            (
                F.col("cn")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))
            ).alias("jaccard"),
            "aa",
            "ra",
        )
    )


def adamic_adar(
    edges: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """Adamic-Adar scores only — a projection of link_prediction (see
    there for semantics, plan, and the max_degree hub cap). Returns
    [a, b, aa]."""
    return link_prediction(edges, max_degree=max_degree).select("a", "b", "aa")


def reciprocity(edges: DataFrame) -> DataFrame:
    """Edge reciprocity of the simple directed graph (self-loops dropped):
    the fraction of directed edges (a, b) whose reverse (b, a) also exists.
    Returns a single row [reciprocated, total, reciprocity].

    Plan: one semi-join of the simple edge set against its own transpose,
    then a global count — two shuffles total.
    """
    simple = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    rev = simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = simple.join(rev, ["src", "dst"], "left_semi").count()
    total = simple.count()
    simple.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(recip, total, (recip / total) if total else 0.0)],
        "reciprocated long, total long, reciprocity double",
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the simple undirected graph: the Pearson
    correlation of (deg(u), deg(v)) over all ORDERED edge ends (each
    undirected edge contributes both (u,v) and (v,u), making the estimator
    symmetric — the same convention networkx's
    degree_assortativity_coefficient uses). Returns one row [assortativity].

    Plan: two broadcast-or-shuffle joins of the degree table onto the edge
    list, then one aggregate computing Pearson r from covar_pop/stddev_pop
    components (the n-1 factors of the sample estimator cancel in the
    ratio). Assembled from components rather than corr() so the degenerate
    zero-variance case (regular graph) yields NULL instead of an ANSI
    divide-by-zero error.
    """
    und = symmetrize(edges)
    deg = simple_degrees(edges)
    ends = und.join(
        deg.select(F.col("node").alias("src"), F.col("deg").alias("deg_src")), "src"
    ).join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("deg_dst")), "dst"
    )
    agg = ends.agg(
        F.covar_pop("deg_src", "deg_dst").alias("cov"),
        F.stddev_pop("deg_src").alias("sx"),
        F.stddev_pop("deg_dst").alias("sy"),
    )
    return agg.select(
        F.when(
            (F.col("sx") > 0) & (F.col("sy") > 0),
            F.col("cov") / (F.col("sx") * F.col("sy")),
        ).alias("assortativity")
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Average neighbor degree per vertex on the simple undirected graph
    (Pastor-Satorras/Vázquez/Vespignani's k_nn building block). Returns
    [node, deg, avg_nbr_deg].

    Plan: one degree join onto the symmetrized edge list keyed by the
    NEIGHBOR end, then one avg() groupBy on the node end and a final
    degree join for the node's own degree — two shuffles."""
    und = symmetrize(edges)
    deg = simple_degrees(edges)
    nbr = und.join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("nbr_deg")),
        "dst",
    )
    per_node = nbr.groupBy(F.col("src").alias("node")).agg(
        F.avg("nbr_deg").alias("avg_nbr_deg")
    )
    return per_node.join(deg, "node").select("node", "deg", "avg_nbr_deg")


def knn_curve(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve k_nn(k): the mean of avg_neighbor_degree
    over vertices of degree k (rising = assortative, falling =
    disassortative — the distributional companion of the single-number
    degree_assortativity). Returns [deg, n_nodes, knn]."""
    return (
        avg_neighbor_degree(edges)
        .groupBy("deg")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.avg("avg_nbr_deg").alias("knn"),
        )
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """Global transitivity C = 3·triangles / wedges, where wedges =
    Σ_v deg(v)·(deg(v)−1)/2 on the simple undirected graph (the
    "global clustering coefficient" — corpus-level cousin of the
    per-vertex lcc). Returns one row [triangles, wedges, transitivity];
    NULL transitivity when the graph has no wedge.

    Plan: degree aggregate (one shuffle) + the degree-ordered triangle
    count (operators/triangles.py) + a final 1-row combine."""
    from linkgraph.operators.triangles import triangles_per_vertex

    deg = simple_degrees(edges)
    wedges = deg.agg(
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("wedges")
    )
    # coalesce: sum over the empty per-vertex table (triangle-free graph)
    # is NULL, but the count is genuinely 0
    tri = triangles_per_vertex(edges).agg(
        (F.coalesce(F.sum("triangles"), F.lit(0)) / 3).cast("long").alias("triangles")
    )
    return tri.crossJoin(wedges).select(
        "triangles",
        "wedges",
        F.when(
            F.col("wedges") > 0,
            3.0 * F.col("triangles") / F.col("wedges"),
        ).alias("transitivity"),
    )


def powerlaw_alpha(edges: DataFrame, d_min: int = 2) -> DataFrame:
    """Hill/Clauset MLE of the degree-distribution power-law exponent on
    the simple undirected graph: α = 1 + n_tail / Σ_{deg ≥ d_min}
    ln(deg / (d_min − 1/2)) (the discrete-data estimator of
    Clauset-Shalizi-Newman, SIAM Rev. 2009, eq. 3.7). Returns one row
    [n_tail, alpha]; NULL when no vertex reaches d_min.

    One aggregate over the degree table — the standard scale-free-ness
    probe for link graphs."""
    deg = simple_degrees(edges).filter(F.col("deg") >= d_min)
    return deg.agg(
        F.count(F.lit(1)).alias("n_tail"),
        (
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("deg") / (d_min - 0.5)))
        ).alias("alpha"),
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club curve φ(k) = 2·E_k / (N_k·(N_k−1)) for every degree
    threshold k present in the graph, where N_k = #nodes with deg > k and
    E_k = #edges with both ends above k (Zhou & Mondragón 2004). Returns
    [k, n_nodes, n_edges, phi] for thresholds with N_k ≥ 2.

    Plan: degrees joined onto the canonical a<b edge list once; the node
    and edge tallies then reduce to per-threshold counts with one range
    join over the DISTINCT degree values (tiny table) — no per-threshold
    rescan of nodes or edges."""
    deg = simple_degrees(edges)
    und = symmetrize(edges).filter(F.col("src") < F.col("dst"))
    e_min = (
        und.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("da")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("db")), "dst")
        .select(F.least("da", "db").alias("dmin"))
    )
    # thresholds = distinct degrees; counts above k via a tiny range join
    ks = deg.select(F.col("deg").alias("k")).distinct()
    node_cnt = deg.groupBy(F.col("deg").alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # nodes with deg > k  = suffix count at key = k (strictly greater)
    nodes_gt = (
        ks.join(node_cnt, ks["k"] < node_cnt["key"])
        .groupBy("k")
        .agg(F.sum("c").alias("n_nodes"))
    )
    edge_cnt = e_min.groupBy(F.col("dmin").alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    edges_gt = (
        ks.join(edge_cnt, ks["k"] < edge_cnt["key"])
        .groupBy("k")
        .agg(F.sum("c").alias("n_edges"))
    )
    return (
        nodes_gt.join(edges_gt, "k", "left")
        .filter(F.col("n_nodes") >= 2)
        .select(
            "k",
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
            (
                2.0
                * F.coalesce(F.col("n_edges"), F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1))
            ).alias("phi"),
        )
    )


def modularity_by_label(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a vertex partition, reported per community:
    [label, intra_edges, deg_sum, contrib] where

        contrib(c) = intra_c / m  -  (deg_c / (2m))^2

    and Q = Σ_c contrib(c) (Newman & Girvan, "Finding and evaluating
    community structure in networks", Phys. Rev. E 69, 2004 — the
    community-summed form). Graph semantics: simple undirected (self-loops
    dropped, parallel edges collapsed), m = undirected edge count;
    ``labels`` is [node, label] covering every endpoint (unlabeled
    endpoints raise on the inner join by dropping edges — callers pass a
    total labeling, e.g. LPA/components output or a hash bucketing).

    Plan: label both endpoints of the symmetrized edge set (two
    vertex-keyed hash joins — broadcast when the labeling is small), one
    label-keyed aggregate for intra counts, one for community degree sums,
    and a 1-row m combine — no wedge joins, scale-safe at any community
    count."""
    sym = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # materialized, not persist(): the returned plan references sym
    # three ways and no action runs while a lazy cache is in effect
    sym = (
        sym.unionByName(
            sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = labels.select("node", "label")
    both = (
        sym.join(lab.withColumnRenamed("node", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("node", "dst").withColumnRenamed("label", "ld"), "dst")
    )
    # sym holds each undirected edge twice -> intra pairs / 2
    intra = (
        both.filter(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("intra_edges"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    degc = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(F.sum("deg").alias("deg_sum"))
    )
    m_row = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("m"))
    return (
        degc.join(intra, "label", "left")
        .crossJoin(m_row)
        .select(
            "label",
            F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
            "deg_sum",
            (
                F.coalesce("intra_edges", F.lit(0)) / F.col("m")
                - F.pow(F.col("deg_sum") / (2.0 * F.col("m")), 2)
            ).alias("contrib"),
        )
    )


def conductance_by_label(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Conductance of each community of a vertex partition:
    [label, cut_edges, vol, conductance] where

        phi(c) = cut_c / min(vol_c, 2m - vol_c)

    with cut_c = undirected edges with exactly one endpoint labeled c,
    vol_c = sum of degrees of c's members (Kannan, Vempala & Vetta "On
    clusterings: good, bad and spectral", JACM 2004 — the standard
    cluster-quality complement to modularity: low conductance = few
    escaping edges relative to the smaller side's volume). Graph
    semantics match ``modularity_by_label``: simple undirected
    (self-loops dropped, parallel edges collapsed); ``conductance`` is
    NULL when the denominator is 0 (a label owning ALL volume).

    Plan: identical shape to ``modularity_by_label`` — label both
    endpoints of the symmetrized edge set (two vertex-keyed hash joins),
    then each directed copy leaving its community counts its cut edge
    exactly once, so cut_c is one label-keyed aggregate; vol_c is a
    degree sum; 2m is a 1-row combine. No wedge joins, scale-safe at any
    community count. The symmetrized edge set is MATERIALIZED
    (localCheckpoint) because the returned plan references it four ways
    — a lazy persist/unpersist pair around a lazily-returned DataFrame
    caches nothing."""
    sym = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = (
        sym.unionByName(
            sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = labels.select("node", "label")
    both = (
        sym.join(
            lab.withColumnRenamed("node", "src").withColumnRenamed("label", "ls"),
            "src",
        )
        .join(
            lab.withColumnRenamed("node", "dst").withColumnRenamed("label", "ld"),
            "dst",
        )
    )
    cut = (
        both.filter(F.col("ls") != F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # left join + coalesce: a label whose members are ALL isolated
    # vertices still gets its row (vol 0, cut 0, conductance NULL) —
    # the docstring promises one row per community of the labeling
    volc = (
        lab.join(deg, "node", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("deg", F.lit(0))).alias("vol"))
    )
    m2_row = sym.agg(F.count(F.lit(1)).alias("m2"))  # 2m directed copies
    denom = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return (
        volc.join(cut, "label", "left")
        .crossJoin(m2_row)
        .select(
            "label",
            F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
            "vol",
            F.when(
                denom > 0,
                F.coalesce("cut_edges", F.lit(0)) / denom,
            ).alias("conductance"),
        )
    )


def square_count(edges: DataFrame) -> DataFrame:
    """Global 4-cycle (square) count of the simple undirected view —
    the motif-census companion to ``triangles.py``. Identity: every
    4-cycle u−x−v−y−u is determined by its two opposite pairs, so

        #C4 = (1/2) · Σ_{u<v} C(cn(u,v), 2)

    with cn(u, v) = common-neighbor count (each cycle is counted once
    by each of its two diagonals). Returns one row
    [n_pairs, square_count].

    Plan: one wedge join through the mid vertex (ordered endpoints
    a < c halve the pair space), a (a, c)-keyed count, and a 1-row
    combine. Fan-out is Σ_b deg(b)² — the same wedge budget
    clustering_coefficients already pays; power-law mid-vertex skew at
    100× is the known cost of EXACT square counting — at that scale use
    ``square_count_doulion`` (edge-sampled unbiased estimator, wedge
    budget shrunk by p²)."""
    sym = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    l = und.select(F.col("dst").alias("mid"), F.col("src").alias("a"))
    r = und.select(F.col("src").alias("mid"), F.col("dst").alias("c"))
    cn = (
        l.join(r, "mid")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    return cn.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # coalesce: sum over an empty cn table (wedge-free graph, e.g. a
        # perfect matching) is NULL, but the correct census is 0
        F.coalesce(
            (F.sum(F.col("cn") * (F.col("cn") - 1) / 2) / 2).cast("long"),
            F.lit(0),
        ).alias("square_count"),
    )


def square_count_doulion(
    edges: DataFrame, p: float = 0.5, salt: str = "squares"
) -> DataFrame:
    """DOULION-style approximate 4-cycle census (Tsourakakis et al.,
    KDD'09, applied to C4): keep each undirected edge with probability
    ``p`` via a deterministic md5 coin on the canonical (min, max, salt)
    key — both directions draw the same coin — then run the exact
    ``square_count`` wedge plan on the sparsified graph and scale by
    1/p⁴ (a square survives iff all 4 edges survive). Returns one row
    [kept_edges, sampled_squares, square_estimate].

    This is the 100-TB path for the square census: the wedge budget
    Σ deg² drops by p² and the hot-mid skew with it, for variance
    ~1/(p⁴·#C4). Deterministic, repartition-stable, and value-checkable
    in ANSI SQL (the coin is the same engine-portable md5 cutoff rule as
    ``triangle_count_doulion``). p=1 degenerates to the exact census."""
    from linkgraph.operators.sampling import _DIGITS, hex_cutoff

    if not (0 < p <= 1):
        raise ValueError(f"p must be in (0, 1], got {p}")
    cutoff = hex_cutoff(p)
    canon = F.concat_ws(
        "|",
        F.least(F.col("src"), F.col("dst")).cast("string"),
        F.greatest(F.col("src"), F.col("dst")).cast("string"),
        F.lit(salt),
    )
    kept = edges.filter(F.substring(F.md5(canon), 1, _DIGITS) < cutoff)
    kept_m = (
        kept.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("kept_edges"))
    )
    sq = square_count(kept).select(
        F.col("square_count").alias("sampled_squares"),
        F.round(F.col("square_count") / F.lit(float(p) ** 4), 6).alias(
            "square_estimate"
        ),
    )
    return kept_m.crossJoin(sq)


def project_bipartite(
    edges: DataFrame,
    side: str = "src",
    min_weight: int = 1,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """One-mode projection of a bipartite edge table: two ``side``
    vertices connect iff they share an opposite-side neighbor, weighted
    by how many they share (the co-occurrence graph — user-user via
    shared events, doc-doc via shared shingles, the standard first move
    on any bipartite interaction log). Returns [a, b, w] with a < b.

    Plan: one self-join through the shared opposite vertex + one
    (a, b)-keyed count — the wedge budget is Σ deg² over the OPPOSITE
    side. ``max_pivot_degree`` bounds that budget: pivots shared by more
    than that many ``side`` vertices are DROPPED before the self-join
    (one extra pivot-keyed count + semi-join), capping per-pivot fan-out
    at cap² — the knob that keeps the projection alive on power-law
    interaction logs at 100× (a pivot shared by everyone adds cliques,
    not signal; same degree-tiered precedent as the hub salting in
    plans/shards.py). None = exact projection; capped == exact whenever
    every pivot degree <= cap (pinned in tests). ``min_weight`` filters
    weak co-occurrences post-count."""
    if side not in ("src", "dst"):
        raise ValueError("side must be 'src' or 'dst'")
    if max_pivot_degree is not None and max_pivot_degree < 1:
        raise ValueError(f"max_pivot_degree must be >= 1, got {max_pivot_degree}")
    other = "dst" if side == "src" else "src"
    e = edges.select(side, other).distinct()
    if max_pivot_degree is not None:
        keep = (
            e.groupBy(F.col(other).alias("pivot"))
            .agg(F.count(F.lit(1)).alias("pdeg"))
            .filter(F.col("pdeg") <= max_pivot_degree)
            .select("pivot")
        )
        e = e.join(
            keep.select(F.col("pivot").alias(other)), other, "left_semi"
        )
    l = e.select(F.col(other).alias("pivot"), F.col(side).alias("a"))
    r = e.select(F.col(other).alias("pivot"), F.col(side).alias("b"))
    return (
        l.join(r, "pivot")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
    )
