"""Components / LPA / triangles — EXACT assignment tests (north rule:
'component/label assignments exactly'; triangle counts exact integers)."""

import numpy as np
import pytest

from linkgraph import oracle
from linkgraph.operators.components import connected_components
from linkgraph.operators.lpa import label_propagation
from linkgraph.operators.triangles import triangle_count, triangles_per_vertex
from tests import conftest as fx


@pytest.mark.parametrize(
    "fixture", [fx.toy_chain_dangling, fx.two_components, fx.karate_club, fx.multi_edge]
)
def test_components_exact(spark, fixture):
    src, dst, n = fixture()
    df = fx.edges_df(spark, src, dst)
    res = connected_components(df)
    got = {r["node"]: r["component"] for r in res.components.collect()}
    want = oracle.connected_components(src, dst, n)
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    assert {i: got[i] for i in present} == {i: int(want[i]) for i in present}


@pytest.mark.parametrize(
    "fixture", [fx.toy_chain_dangling, fx.two_components, fx.karate_club, fx.multi_edge]
)
def test_components_twophase_exact(spark, fixture):
    """Large-star/small-star must equal the union-find oracle exactly —
    and therefore the min-label algorithm — on every fixture."""
    from linkgraph.operators.components import connected_components_twophase

    src, dst, n = fixture()
    df = fx.edges_df(spark, src, dst)
    res = connected_components_twophase(df)
    got = {r["node"]: r["component"] for r in res.components.collect()}
    want = oracle.connected_components(src, dst, n)
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    assert {i: got[i] for i in present} == {i: int(want[i]) for i in present}


def test_components_twophase_star_hub(spark):
    """Hub fixture: converges in few rounds (the O(log n) property's point)."""
    from linkgraph.operators.components import connected_components_twophase

    src, dst, n = fx.star_hub(500)
    res = connected_components_twophase(fx.edges_df(spark, src, dst))
    comps = {r["component"] for r in res.components.collect()}
    assert comps == {0}  # one component rooted at min id
    assert res.iterations <= 5


def test_components_converged_flag(spark):
    src, dst, n = fx.two_components()
    res = connected_components(fx.edges_df(spark, src, dst))
    assert res.iter_metrics[-1]["changed"] == 0  # true fixpoint reached
    assert res.components.select("component").distinct().count() == 2


@pytest.mark.parametrize("fixture", [fx.two_components, fx.karate_club, fx.multi_edge])
def test_lpa_exact(spark, fixture):
    src, dst, n = fixture()
    df = fx.edges_df(spark, src, dst)
    res = label_propagation(df, max_iter=10)
    got = {r["node"]: r["label"] for r in res.labels.collect()}
    want = oracle.label_propagation(src, dst, n, max_iter=10)
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    assert {i: got[i] for i in present} == {i: int(want[i]) for i in present}


def test_triangles_karate(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    assert triangle_count(df) == 45  # known ground truth for karate club


def test_triangles_multi_edge_and_self_loop(spark):
    """multi-edges/self-loops must not inflate counts: fixture graph
    0-1, 0-2, 1-2 (plus dupes + self-loop) has exactly one triangle."""
    src, dst, n = fx.multi_edge()
    df = fx.edges_df(spark, src, dst)
    assert triangle_count(df) == 1
    per_v = {r["node"]: r["triangles"] for r in triangles_per_vertex(df).collect()}
    assert per_v == {0: 1, 1: 1, 2: 1}


def test_triangles_oracle_parity(spark):
    src, dst, n = fx.karate_club()
    assert triangle_count(fx.edges_df(spark, src, dst)) == oracle.triangle_count(src, dst, n)


def test_triangles_none(spark):
    src, dst, n = fx.toy_chain_dangling()
    assert triangle_count(fx.edges_df(spark, src, dst)) == 0
