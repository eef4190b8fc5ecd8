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

from transilien_api_etl_spark.io import load_table
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
