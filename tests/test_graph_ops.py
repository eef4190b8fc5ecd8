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
