"""Graph-operator semantics beyond registry parity: brute-force triangle
cross-check at test scale."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from transilien_api_etl_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_triangle_count_matches_brute_force(spark):
    row = REGISTRY["graph_triangle_stats"].fn(spark, SF).first()
    # rebuild the thresholded edge set the query defines, then count
    # triangles by enumerating all node triples (fine at 25 nodes)
    from transilien_api_etl_spark.io import load_table

    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    s = load_table(spark, SF, "supplier")
    vol = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
            .cast("double")
            .alias("v")
        )
        .toPandas()
    )
    thr = vol["v"].quantile(0.6, interpolation="linear")
    edges = {(r.a, r.b) for r in vol[vol["v"] > thr].itertuples()}
    nodes = {n for e in edges for n in e}
    tri = sum(
        1
        for x, y, z in combinations(sorted(nodes), 3)
        if (x, y) in edges and (y, z) in edges and (x, z) in edges
    )
    wedges = 0
    for n in nodes:
        d = sum(1 for e in edges if n in e)
        wedges += d * (d - 1) // 2
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert abs(row["clustering_coef"] - 3 * tri / wedges) < 1e-6


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-Python oracle: node -> min member id of its component.
    Mirrors connected_components' contract: only nodes incident to a
    non-self-loop edge are labeled (self-loops are filtered, isolated
    nodes never enter the edge list)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_property_random_graphs(spark):
    """Property check of the large-star/small-star rounds (the dedup
    clustering backbone) against a union-find oracle on adversarial
    random graphs: duplicate edges, self-loops, both edge orientations,
    many components, and long chains that need multiple rounds.
    Hypothesis-driven example generation, but with a FIXED derandomized
    profile so CI cost is bounded and failures replay."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from transilien_api_etl_spark.operators.components import connected_components

    edges_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
    )

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=edges_strategy)
    def check(edges):
        expected = _union_find_components(edges)
        if not expected:  # all self-loops: operator returns an empty frame
            assert connected_components(
                spark.createDataFrame(edges, "s long, d long"), "s", "d"
            ).count() == 0
            return
        got = {
            r["node"]: r["cluster"]
            for r in connected_components(
                spark.createDataFrame(edges, "s long, d long"), "s", "d"
            ).collect()
        }
        assert got == expected

    check()
