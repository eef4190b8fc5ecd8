"""End-to-end LLM pretrain-data curation pipeline (BASELINE mandate:
dedup + text analysis composed as one job, the shape a training-data run
actually executes).

Stages, all pure-DataFrame (zero Python UDFs, one shuffle per stage):
1. per-doc metrics — token count, distinct ratio, stopword ratio,
   language-ID argmax (``functions/text.py`` expressions);
2. quality gate — Gopher-style rules: min length, repetition cap
   (distinct ratio), stopword-share ceiling;
3. exact dedup — sha256(text) group, keeper = min doc_id;
4. corpus report — per predicted language: unique docs, dupes removed,
   token budget, mean quality.

Scale posture: stage 3 is the only wide shuffle (on the 32-byte digest —
uniform, skew-free); stages 1-2 are map-only and fuse into the scan's
whole-stage codegen; stage 4's input is |unique docs| rows and its
group-by key has ~4 values, so it collapses map-side. At 100 TB the plan
is scan → filter → one digest shuffle → tiny agg: the minimum possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.text import (
    predict_lang,
    stopword_count,
    tokenize,
)
from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs

# Gopher-style quality gate (rules over pure counts, engine-agnostic).
MIN_TOKENS = 25
MIN_DISTINCT_RATIO = 0.35
MAX_STOP_RATIO = 0.6

_STOP_SQL = "'the','a','of','and','to','in','is'"

# Shared oracle CTEs: metrics + quality gate + exact dedup, mirrored from
# the DataFrame stages below.
_PIPELINE_CTE = f"""
WITH m AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS distinct_ratio,
         len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) * 1.0
           / len(string_split(text, ' ')) AS stop_ratio,
         lang,
         (SELECT CASE WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
                      WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
                      WHEN s_es > s_en THEN 'es'
                      ELSE 'en' END
          FROM (SELECT
            len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','in','is'))) AS s_en,
            len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','nicht')))     AS s_de,
            len(list_filter(string_split(text,' '), x -> x IN ('le','la','les','et','ne')))           AS s_fr,
            len(list_filter(string_split(text,' '), x -> x IN ('el','los','las','y','no')))           AS s_es)
         ) AS predicted
  FROM documents
),
kept AS (
  SELECT *, round(0.5 * distinct_ratio + 0.5 * (1 - stop_ratio), 6) AS quality
  FROM m
  WHERE n_tokens >= {MIN_TOKENS}
    AND distinct_ratio >= {MIN_DISTINCT_RATIO}
    AND stop_ratio <= {MAX_STOP_RATIO}
),
uniq AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_copies,
         min(lang) AS lang, min(predicted) AS predicted,
         CAST(min(n_tokens) AS BIGINT) AS n_tokens, min(quality) AS quality
  FROM kept GROUP BY sha256(text)
)
"""


@register(
    "pretrain_corpus_report",
    doc="Flagship pipeline composition (F9+F10): metrics → quality gate → "
    "exact dedup → per-language corpus report. One digest shuffle end to "
    "end; everything before it fuses into the scan stage. Grouped by the "
    "labeled lang (the heuristic predicted column stays in the curated "
    "output — this corpus shares one vocabulary across langs, so marker "
    "lang-ID is degenerate on the test data by construction).",
    tags=("text", "dedup", "pipeline"),
    bench=True,
    oracle=_PIPELINE_CTE
    + """
SELECT lang, count(*) AS n_unique_docs,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_dupes_removed,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) AS avg_quality
FROM uniq GROUP BY lang ORDER BY lang
""",
)
def pretrain_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    uniq = _curated(spark, sf_dir)
    return (
        uniq.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_unique_docs"),
            F.sum(F.col("n_copies") - 1).alias("n_dupes_removed"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@register(
    "pretrain_curated_docs",
    doc="The curated dataset itself: doc ids surviving the quality gate and "
    "exact dedup, with language and token budget — what a downstream "
    "tokenizer job would read.",
    tags=("text", "dedup", "pipeline"),
    oracle=_PIPELINE_CTE
    + """
SELECT keep_id, lang, predicted, n_tokens, quality
FROM uniq ORDER BY keep_id
""",
)
def pretrain_curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    return _curated(spark, sf_dir).select(
        "keep_id", "lang", "predicted", "n_tokens", "quality"
    ).orderBy("keep_id")


def _curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-3: metrics, quality gate, exact dedup. Same text ⇒ same
    metrics, so min() over the dup group is exact, not arbitrary."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tokens
    stop_ratio = stopword_count(toks) * F.lit(1.0) / n_tokens
    m = d.select(
        "doc_id",
        "text",
        "lang",
        n_tokens.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stop_ratio"),
        predict_lang(toks).alias("predicted"),
    )
    kept = m.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
        & (F.col("stop_ratio") <= MAX_STOP_RATIO)
    ).withColumn(
        "quality",
        F.round(0.5 * F.col("distinct_ratio") + 0.5 * (1 - F.col("stop_ratio")), 6),
    )
    return kept.groupBy(F.sha2("text", 256).alias("text_sha")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("lang").alias("lang"),
        F.min("predicted").alias("predicted"),
        F.min("n_tokens").cast("long").alias("n_tokens"),
        F.min("quality").alias("quality"),
    )
