"""Sketch-based approximate operators (SURVEY §3 A2-adjacent; the streaming
/ heavy-hitter side of the LLM-data mandate).

Count-min sketch built as a pure-DataFrame composition: D hash rows × W
buckets, update = one explode + one group-by, point query = min over the D
bucket counters. The sketch table is D·W rows regardless of input size —
the whole point at 100 TB: per-token frequency state in O(D·W), mergeable
across partitions/streams by summing bucket counts (the group-by IS the
merge). Estimates never undercount (each counter ≥ true count); the
overcount is bounded by collisions — asserted as a property in
tests/test_sketches.py against the exact word-frequency twin
(``docs_word_freq_top20``).

Hash-checked since round 3: the bucket hash is the portable md5 form
(functions/text.portable_token_hash of '<seed>:<token>'), so the DuckDB
oracle rebuilds the identical sketch and replays the min-over-rows
estimate — on top of the exact-twin property tests
(tests/test_sketches.py) and the `sketch_cms_error_bounds` guarantee
check in twin_checks_q.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.text import tokenize
from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs

CMS_WIDTH = 512  # buckets per hash row (ε ≈ e/W)
CMS_DEPTH = 4  # independent hash rows (δ ≈ e^-D)
TOP_K = 30


def _bucket(col: F.Column, seed: int) -> F.Column:
    """Row `seed`'s bucket for a token: the portable md5-based hash of
    '<seed>:<token>' mod W (round 3 — was seeded xxhash64, which DuckDB
    cannot reproduce; the md5 form makes the WHOLE sketch SQL-exact)."""
    from transilien_api_etl_spark.functions.text import portable_token_hash

    return F.pmod(
        portable_token_hash(F.concat(F.lit(f"{seed}:"), col)), F.lit(CMS_WIDTH)
    )


def _bucket_sql(tok_expr: str, seed_expr: str) -> str:
    """DuckDB twin of ``_bucket`` for a token expression and seed expression."""
    return (
        f"CAST(('0x' || substr(md5(CAST({seed_expr} AS VARCHAR) || ':' || "
        f"{tok_expr}), 1, 15)) AS BIGINT) % {CMS_WIDTH}"
    )


def cms_sketch(tokens: DataFrame, col: str = "tok") -> DataFrame:
    """Build the D×W counter table from a token stream: (seed, bucket, cnt).

    One explode (D rows per token, D is a small constant) + one group-by on
    (seed, bucket) — a key space of exactly D·W values, so the shuffle
    reduces to D·W rows no matter how many tokens went in.
    """
    rows = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), _bucket(F.col(col), s).alias("bucket"))
            for s in range(CMS_DEPTH)
        ]
    )
    return (
        tokens.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.seed").alias("seed"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_CMS_SEEDS_SQL = "(VALUES " + ", ".join(f"({s})" for s in range(CMS_DEPTH)) + ") seeds(s)"


@register(
    "sketch_heavy_hitters_cms",
    doc="Count-min-sketch heavy hitters: top-30 tokens by CMS-estimated "
    "frequency (min over 4 seeded md5-bucket rows of 512 buckets). The "
    "sketch is 2048 rows and broadcasts into the estimate join; the "
    "distinct-token probe side is the only data-sized relation. Estimates "
    "are upper bounds by construction; tests/test_sketches.py asserts "
    "est ≥ exact and bounded overcount against the exact twin. "
    "HASH-CHECKED since round 3: the portable bucket hash lets DuckDB "
    "rebuild the identical sketch and replay the min-over-rows estimate.",
    tags=("sketch", "text", "approx"),
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
sketch AS (
  SELECT s, {_bucket_sql("tok", "s")} AS bucket, count(*) AS cnt
  FROM tok, {_CMS_SEEDS_SQL}
  GROUP BY 1, 2),
probes AS (SELECT DISTINCT tok FROM tok),
est AS (
  SELECT p.tok, min(sk.cnt) AS est_count
  FROM probes p, {_CMS_SEEDS_SQL}
  JOIN sketch sk
    ON sk.s = seeds.s AND sk.bucket = {_bucket_sql("p.tok", "seeds.s")}
  GROUP BY p.tok)
SELECT tok, CAST(est_count AS BIGINT) AS est_count
FROM est ORDER BY est_count DESC, tok LIMIT {TOP_K}
""",
)
def sketch_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    sketch = cms_sketch(tok)

    probes = tok.distinct().select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"), _bucket(F.col("tok"), s).alias("bucket")
                    )
                    for s in range(CMS_DEPTH)
                ]
            )
        ).alias("r"),
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (F.col("r.seed") == F.col("seed")) & (F.col("r.bucket") == F.col("bucket")),
        )
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.desc("est_count"), "tok")
        .limit(TOP_K)
    )


@register(
    "sketch_hll_mergeable_rollup",
    doc="Mergeable HLL distinct-count rollup (Apache DataSketches via "
    "hll_sketch_agg / hll_union_agg): per-priority customer sketches are "
    "built once, then the GLOBAL distinct estimate is derived by merging "
    "the per-group sketches — never rescanning the data. That "
    "sketch-union algebra is the 100 TB rollup pattern (hourly sketches → "
    "daily → monthly, one scan total). The oracle states exact distincts "
    "and TRUE accuracy flags; an estimate drifting >2% of truth on "
    "either path (sketch-merged or direct) fails the hash match.",
    tags=("sketch", "approx", "agg"),
    oracle="""
WITH per AS (
  SELECT o_orderpriority AS grp,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY o_orderpriority
),
gtotal AS (
  SELECT 'ALL' AS grp, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders
)
SELECT grp, n_exact, TRUE AS est_within_2pct, TRUE AS merge_within_2pct
FROM (SELECT * FROM per UNION ALL SELECT * FROM gtotal)
ORDER BY grp
""",
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count_distinct("o_custkey").cast("long").alias("n_exact"),
    )
    merged = per.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.lit("ALL").alias("grp"),
    )
    direct = o.agg(
        F.hll_sketch_agg("o_custkey").alias("sk_direct"),
        F.count_distinct("o_custkey").cast("long").alias("n_exact"),
    )
    # On the ALL row, est_within_2pct judges the DIRECT single-pass sketch
    # and merge_within_2pct the union-MERGED one — a drift in either flag
    # must point at the path that actually drifted (the two were swapped
    # until round 5; both true on this data, so the oracle hash never saw
    # the difference, but the diagnosis the query exists for was inverted).
    g = merged.crossJoin(direct).select(
        "grp",
        "n_exact",
        F.hll_sketch_estimate("sk_direct").alias("est_single"),
        F.hll_sketch_estimate("sk").alias("est_merged"),
    )
    per_rows = per.select(
        "grp",
        "n_exact",
        F.hll_sketch_estimate("sk").alias("est_single"),
        F.hll_sketch_estimate("sk").alias("est_merged"),
    )
    both = per_rows.unionByName(g)
    return both.select(
        "grp",
        "n_exact",
        (
            F.abs(F.col("est_single") - F.col("n_exact")) / F.col("n_exact") <= 0.02
        ).alias("est_within_2pct"),
        (
            F.abs(F.col("est_merged") - F.col("n_exact")) / F.col("n_exact") <= 0.02
        ).alias("merge_within_2pct"),
    ).orderBy("grp")


@register(
    "agg_bitmap_exact_distinct",
    doc="EXACT distinct counting via mergeable bitmaps (Spark 3.5 "
    "bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg — "
    "A2's third path beside exact count-distinct and HLL): keys bucket "
    "into 32768-bit bitmaps, per-bucket bitmaps OR-merge cheaply, and "
    "popcounts sum to the exact answer. Unlike count(DISTINCT) this "
    "pre-aggregates map-side into fixed-size state — the exact-distinct "
    "pattern that survives 100 TB rollups. Oracle: plain count(DISTINCT).",
    tags=("agg", "sketch", "bitmap"),
    oracle="""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_bm_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(sum(cnt) AS BIGINT) AS n_distinct
        FROM (
          SELECT o_orderpriority, bitmap_bucket_number(o_custkey) AS bucket,
                 bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey))) AS cnt
          FROM _bm_orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )
