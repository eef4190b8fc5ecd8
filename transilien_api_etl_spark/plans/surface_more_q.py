"""Second-wave Spark 4 SQL surface — SURVEY.md §3.11 Y12 depth.

Registered late (import after `windows` in plans/__init__.py — the round-2
front-load order must not shift; see text_more_q).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs


@register(
    "agg_approx_top_k_twin",
    doc="Sketch-based heavy hitters via Spark 4's approx_top_k (SURVEY §3 "
    "A2-family): the sketch tracks up to 10k items, so on a 5-value "
    "column its counts are EXACT and the oracle is the plain group-by "
    "top-3 — the same checked-twin pattern as agg_approx_distinct_twin, "
    "but hash-exact instead of tolerance-checked. The sketch is "
    "mergeable, which is what makes it the right shape for a 100 TB "
    "two-phase (partial/final) heavy-hitter pass; re-sorted "
    "deterministically on (n desc, item) after explode.",
    tags=("agg", "sketch", "spark4"),
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
ORDER BY n DESC, event_type LIMIT 3
""",
)
def agg_approx_top_k_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    sk = e.agg(F.expr("approx_top_k(event_type, 3, 10000)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("s"))
        .select(
            F.col("s.item").alias("event_type"),
            F.col("s.count").cast("long").alias("n"),
        )
        .orderBy(F.desc("n"), "event_type")
    )


@register(
    "sql_pipe_revenue_by_status",
    doc="SQL pipe syntax (Spark 4 `|>` operators, SURVEY §3.11 Y12): the "
    "q1-family rollup written as FROM … |> WHERE … |> AGGREGATE … |> "
    "ORDER BY — same logical plan as the method-chained DataFrame form, "
    "proving the new surface parses to the identical Catalyst tree; "
    "oracle is the equivalent classic SQL.",
    tags=("sql", "spark4", "pipe"),
    oracle="""
SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def sql_pipe_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql("""
FROM lineitem_pipe
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> AGGREGATE CAST(count(*) AS BIGINT) AS n,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
   GROUP BY l_linestatus
|> ORDER BY l_linestatus
""").select("l_linestatus", "n", "revenue")


@register(
    "udtf_polymorphic_charstats",
    doc="POLYMORPHIC Python UDTF (SURVEY §3.10 X4 depth — Spark 4's "
    "analyze() protocol): the output schema is computed at plan time "
    "from a literal argument — one counter column per character of the "
    "spec string — so the same UDTF yields different relations per call "
    "site. Arrow-batched like every Python crossing in this repo. The "
    "oracle recomputes each counter with length-difference arithmetic.",
    tags=("udtf", "spark4", "polymorphic"),
    oracle="""
SELECT doc_id,
       CAST(len(text) - len(replace(text, 'a', '')) AS INTEGER) AS n_a,
       CAST(len(text) - len(replace(text, 'e', '')) AS INTEGER) AS n_e,
       CAST(len(text) - len(replace(text, 's', '')) AS INTEGER) AS n_s
FROM documents WHERE doc_id < 100 ORDER BY doc_id
""",
)
def udtf_polymorphic_charstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import IntegerType, LongType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class CharStats:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument, spec: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(spec.value, str) or not spec.value:
                raise ValueError("spec must be a non-empty string literal")
            schema = StructType().add("doc_id", LongType())
            for ch in spec.value:
                schema = schema.add(f"n_{ch}", IntegerType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id, text, spec):
            yield (doc_id, *[(text or "").count(ch) for ch in spec])

    fn = udtf(CharStats)
    spark.udtf.register("char_stats", fn)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("docs_cs")
    return spark.sql(
        "SELECT s.* FROM docs_cs, LATERAL char_stats(doc_id, text, 'aes') s"
    ).orderBy("doc_id")
