"""Graph plans beyond dedup clustering — SURVEY §3 F10 neighborhood.

PageRank over the supplier→customer trade graph derived from
lineitem⋈orders. The Spark path is the iterative operator in
``operators/components.py``; the oracle unrolls the same five steps as
chained CTEs (recursive CTEs forbid the per-step aggregation, so the
unroll IS the honest SQL statement of the algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table, materialize_small
from transilien_api_etl_spark.operators.components import pagerank
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs

_D = 0.85
_ITERS = 5


def _pagerank_oracle() -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f""",
c{i} AS (
  SELECT e.dst AS node, sum(p.rank / d.outd) AS s
  FROM pr{i - 1} p JOIN edges e ON p.node = e.src JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
pr{i} AS (
  SELECT n.node,
         (1 - {_D}) / (SELECT n FROM nn) + {_D} * coalesce(c{i}.s, 0) AS rank
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node
)""")
    tail = f"""
SELECT node, round(rank * 1000, 6) AS rank_permille
FROM pr{_ITERS} ORDER BY node"""
    return head + "".join(steps) + tail


@register(
    "graph_pagerank_trade",
    doc="Fixed-iteration PageRank (d=0.85, 5 rounds) on the supplier→"
    "customer trade graph (operators/components.py pagerank): per-round "
    "one shuffle join + agg, degree/edge tables computed once, lineage "
    "cut every other round. Ranks reported per-mille, rounded, for "
    "float-stable cross-engine hashing.",
    tags=("graph", "iterative"),
    oracle=_pagerank_oracle(),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, damping=_D, iterations=_ITERS)
    return pr.select(
        "node", F.round(F.col("rank") * 1000, 6).alias("rank_permille")
    ).orderBy("node")


@register(
    "graph_triangle_stats",
    doc="Triangle count + global clustering coefficient on the undirected "
    "nation-trade graph (SURVEY §3 F10 neighborhood): nodes = nations, "
    "edge (a,b) iff a supplier in a shipped to a customer in b. The "
    "count uses the oriented-edge pattern (every edge stored once as "
    "a<b; triangles found by joining two oriented edges on their low "
    "endpoint and closing with a third) — the same join shape "
    "large-graph engines use after degree-orientation, so it scales as "
    "Σ deg(v)² rather than n³. The raw nation graph is complete, so "
    "edges are thresholded to the top-40%% trade corridors by volume "
    "(exact percentile over exact-cent edge volumes — DECIMAL sums, so "
    "edge membership can never flip on float sum order) to leave real "
    "structure. Wedges come from the degree table; coefficient = "
    "3·triangles / wedges. Oracle CTEs are AS MATERIALIZED (round 8): "
    "vol/raw are multiply-referenced and DuckDB's default inlining "
    "re-evaluated the 4-way fact join per reference — observed 732 s "
    "then an allocator OOM at sf0.1 in the r8 sweep vs 0.1 s "
    "materialized, same result either way.",
    tags=("graph", "triangles"),
    oracle="""
WITH vol AS MATERIALIZED (
  SELECT least(s.s_nationkey, c.c_nationkey) AS a,
         greatest(s.s_nationkey, c.c_nationkey) AS b,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS DECIMAL(38,0))) AS DOUBLE) AS v
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2),
raw AS MATERIALIZED (
  SELECT a, b FROM vol WHERE v > (SELECT quantile_cont(v, 0.6) FROM vol)),
deg AS MATERIALIZED (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM raw UNION ALL SELECT b FROM raw) GROUP BY node),
tri AS MATERIALIZED (
  SELECT count(*) AS n_tri
  FROM raw e1 JOIN raw e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN raw e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_edges,
       CAST((SELECT n_tri FROM tri) AS BIGINT) AS n_triangles,
       round(3.0 * (SELECT n_tri FROM tri)
             / (SELECT sum(d * (d - 1) / 2) FROM deg), 6) AS clustering_coef
""",
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    vol = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
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
    )
    thr = vol.agg(F.expr("percentile(v, 0.6)").alias("thr"))
    lazy_pair = (
        vol.crossJoin(F.broadcast(thr)).filter(F.col("v") > F.col("thr")).select("a", "b")
    )
    # The edge list is nation-bounded (≤ n·(n-1)/2 = 300 rows) but its
    # lineage is the full 4-table fact join; six downstream references
    # would re-run that join six times. Materialize it once driver-side —
    # the same "small model state" contract as k-means centroids.
    pair = materialize_small(lazy_pair, max_rows=1_000)
    e1, e2, e3 = pair.alias("e1"), pair.alias("e2"), pair.alias("e3")
    tri = (
        e1.join(e2, (F.col("e2.a") == F.col("e1.a")) & (F.col("e2.b") > F.col("e1.b")))
        .join(e3, (F.col("e3.a") == F.col("e1.b")) & (F.col("e3.b") == F.col("e2.b")))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        pair.select(F.col("a").alias("node"))
        .unionAll(pair.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).alias("wedges"),
    )
    edges_n = pair.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        summary.crossJoin(edges_n)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").alias("n_triangles"),
            F.round(3.0 * F.col("n_tri") / F.col("wedges"), 6).alias("clustering_coef"),
        )
    )
