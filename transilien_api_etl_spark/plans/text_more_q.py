"""Second-wave text/OLAP analytics — SURVEY.md §3 F9/A1 depth.

Registered late on purpose: the driver's correctness harness walks
registration order and the round-2 front-load (plans/__init__.py) must not
shift, so new modules append after `windows`/`analytics_q`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs

# Same whitespace tokenization the rest of the text family uses
# (docs_token_stats / docs_bigram_counts): the corpus is space-delimited
# lowercase words, so a single-space split is exact on both engines.
_SPARK_TOKS = "split(text, ' ')"
_DUCK_TOKS = "string_split(text, ' ')"


@register(
    "docs_pmi_collocations",
    doc="Top-20 bigram collocations by pointwise mutual information "
    "(SURVEY §3 F9 — the collocation-extraction step of corpus "
    "analysis): PMI = ln(N·c(ab) / (c(a)·c(b))) over adjacent token "
    "pairs, df-floored at 5 occurrences so rare pairs don't dominate. "
    "All counts are exact integers from two map-side-combinable "
    "aggregations (unigrams, bigrams); the log runs once per surviving "
    "bigram. The unigram table broadcasts twice onto the bigram "
    "aggregate — at corpus scale both joins stay broadcast (vocabulary "
    "≪ corpus) and nothing quadratic exists.",
    tags=("text", "collocations"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok,
         generate_subscripts({_DUCK_TOKS}, 1) AS pos
  FROM documents),
uni AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok),
n AS (SELECT sum(c) AS total FROM uni),
bi AS (
  SELECT a.tok AS w1, b.tok AS w2, count(*) AS cab
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.tok, b.tok
  HAVING count(*) >= 5)
SELECT bi.w1, bi.w2, CAST(bi.cab AS BIGINT) AS pair_count,
       round(ln(n.total * bi.cab / (u1.c * CAST(u2.c AS DOUBLE))), 6) AS pmi
FROM bi JOIN uni u1 ON bi.w1 = u1.tok JOIN uni u2 ON bi.w2 = u2.tok, n
ORDER BY pmi DESC, w1, w2 LIMIT 20
""",
)
def docs_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.expr(_SPARK_TOKS)).alias("pos0", "tok")
    )
    # the vocabulary aggregate feeds three consumers (total + two join
    # sides); without a lineage cut each re-runs the corpus explode (8
    # scans, 0 reused exchanges measured). localCheckpoint materializes
    # it once — same trick operators/components.py uses per iteration.
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    total = uni.agg(F.sum("c").alias("total"))
    # adjacent pairs ride a window lead, not a positional self-join: one
    # shuffle on doc_id instead of re-joining the exploded stream to itself
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos0")
    pairs = toks.select(
        F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2")
    ).filter(F.col("w2").isNotNull())
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cab")).filter(
        F.col("cab") >= 5
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(F.col("total") * F.col("cab") / (F.col("c1") * F.col("c2").cast("double"))), 6
    )
    return (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", F.col("cab").alias("pair_count"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@register(
    "events_hierarchical_rollup",
    doc="Continuous-aggregate hierarchy (SURVEY §3 A1/T2 — the "
    "TimescaleDB/Materialize rollup shape): the hourly aggregate is "
    "computed ONCE from the facts, and the daily and monthly levels "
    "re-aggregate the hourly result — count and the exact cent-DECIMAL "
    "sum are mergeable, so coarser grains never rescan the fact table. "
    "At 100 TB the hourly layer is the stored rollup and day/month are "
    "cheap follow-on aggs over it (hours ≪ events); the three levels "
    "union into one tagged result.",
    tags=("events", "window-agg", "rollup"),
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2),
daily AS (
  SELECT date_trunc('day', bucket) AS bucket, event_type,
         sum(n) AS n, sum(cents) AS cents
  FROM hourly GROUP BY 1, 2),
monthly AS (
  SELECT date_trunc('month', bucket) AS bucket, event_type,
         sum(n) AS n, sum(cents) AS cents
  FROM daily GROUP BY 1, 2)
SELECT 'hour' AS grain, bucket, event_type, CAST(n AS BIGINT) AS n,
       round(cents / 100.0, 2) AS total_value FROM hourly
UNION ALL
SELECT 'day', bucket, event_type, CAST(n AS BIGINT), round(cents / 100.0, 2) FROM daily
UNION ALL
SELECT 'month', bucket, event_type, CAST(n AS BIGINT), round(cents / 100.0, 2) FROM monthly
ORDER BY grain, bucket, event_type
""",
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("cents"))
    )
    def _up(df: DataFrame, grain: str) -> DataFrame:
        return (
            df.groupBy(F.date_trunc(grain, "bucket").alias("bucket"), "event_type")
            .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        )
    daily = _up(hourly, "day")
    monthly = _up(daily, "month")
    def _tag(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("cents") / 100.0, 2).alias("total_value"),
        )
    return (
        _tag(hourly, "hour")
        .unionByName(_tag(daily, "day"))
        .unionByName(_tag(monthly, "month"))
        .orderBy("grain", "bucket", "event_type")
    )


@register(
    "docs_token_entropy",
    doc="Per-document token Shannon entropy (SURVEY §3 F9 — a standard "
    "pretraining quality signal: near-zero entropy = degenerate "
    "repetition, the distributional cousin of docs_repetition_metrics): "
    "H = ln(n) - Σ c·ln(c) / n over per-doc token counts, computed from "
    "exact integer counts so the only floats are the final logs. Two "
    "map-side-combinable aggregations keyed by doc — no corpus-wide "
    "state, embarrassingly parallel.",
    tags=("text", "quality", "entropy"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents),
cnt AS (
  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
h AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         round(ln(CAST(sum(c) AS DOUBLE))
               - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
  FROM cnt GROUP BY doc_id)
SELECT doc_id, n_tokens, n_distinct, entropy
FROM h ORDER BY doc_id
""",
)
def docs_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("t"))
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(
                F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )
