"""Hash-checked twin comparisons for the approximate operators
(VERDICT r2 task 6).

These queries register the exact-twin comparisons proven as pytest
properties (tests/test_sketches.py, tests/test_lsh_recall.py) as
driver-checkable queries: the oracle computes the exact side (token
counts, strong-pair counts) in DuckDB and states the property flags as
literals, so a broken sketch/LSH implementation flips a Spark boolean
(or count) and fails the driver's hash compare — a genuine cross-engine
value check of the approximate operator's GUARANTEES (recall floors,
error bounds, separation margins), complementing the operators' own
value oracles. (Historically the sketch/LSH queries were rows-only;
round 3 also converted their hashing to portable md5 forms, so
`sketch_heavy_hitters_cms`, `docs_minhash_candidates`, `udf_simhash`,
`docs_fingerprint` and `lsh_ann_candidates` now each carry a DIRECT
value oracle as well — these twins still matter because a value-correct
sketch can still be a statistically broken one, e.g. a seed collapse
that keeps hashes consistent while destroying recall.)

Scale posture: each check reuses its production query's plan (bounded
sketch state, banded LSH joins, df-capped pair joins) plus one small
aggregate — nothing quadratic, nothing driver-side beyond 1-row results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transilien_api_etl_spark.functions.text import tokenize
from transilien_api_etl_spark.io import load_table
from transilien_api_etl_spark.plans.registry import REGISTRY as _REG
from transilien_api_etl_spark.plans.registry import register
from transilien_api_etl_spark.session import ensure_query_confs

_JACCARD_ORACLE = _REG["docs_shingle_jaccard"].oracle


@register(
    "sketch_cms_error_bounds",
    doc="CMS guarantee check, hash-verified (SURVEY §3 A2/sketches): joins "
    "the CMS heavy-hitter estimates against the exact token counts and "
    "emits (distinct-token count, #undercounts, #over-bound). CMS never "
    "undercounts by construction; overcount beyond 4·N/W (loose form of "
    "the Cormode-Muthukrishnan ε-bound, W=512) indicates a broken bucket "
    "hash. The oracle computes n_tokens exactly and states the zero "
    "violation counts — any CMS bug flips a Spark-side count and fails "
    "the hash compare.",
    tags=("sketch", "approx", "twin-check"),
    oracle="""
SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens,
       CAST(0 AS BIGINT) AS n_undercount,
       CAST(0 AS BIGINT) AS n_over_bound
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
""",
)
def sketch_cms_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    from transilien_api_etl_spark.plans.sketches_q import CMS_WIDTH

    est = _REG["sketch_heavy_hitters_cms"].fn(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    exact = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    totals = exact.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("true_count").alias("n_total"),
    )
    joined = est.join(exact, "tok").crossJoin(F.broadcast(totals))
    # totals is the 1-row base (count over an empty corpus is 0, never
    # NULL) and the violation counts aggregate separately, so an empty
    # estimate set still yields (0, 0, 0) exactly like the oracle.
    violations = joined.agg(
        F.count(F.when(F.col("est_count") < F.col("true_count"), 1)).alias(
            "n_undercount"
        ),
        F.count(
            F.when(
                F.col("est_count")
                > F.col("true_count") + 4.0 * F.col("n_total") / CMS_WIDTH,
                1,
            )
        ).alias("n_over_bound"),
    )
    return totals.select("n_tokens").crossJoin(F.broadcast(violations))


@register(
    "docs_minhash_recall",
    doc="MinHash-LSH recall check, hash-verified (SURVEY §3 F10): the "
    "banded MinHash candidate pairs must recover ≥80% of the strong "
    "(exact Jaccard ≥ 0.4) near-dup pairs. n_true_pairs is SQL-exact "
    "(same pair CTE as docs_shingle_jaccard's oracle); recall_ok is the "
    "integer-arithmetic check 5·hits ≥ 4·truth, stated TRUE by the "
    "oracle — dropped LSH bands or broken seeding flips it.",
    tags=("dedup", "text", "twin-check"),
    oracle=f"""
WITH jac AS ({_JACCARD_ORACLE})
SELECT CAST(count(*) AS BIGINT) AS n_true_pairs, TRUE AS recall_ok
FROM jac WHERE jaccard >= 0.4
""",
)
def docs_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    strong = (
        _REG["docs_shingle_jaccard"]
        .fn(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.4)
        .select("doc_a", "doc_b")
    )
    cands = (
        _REG["docs_minhash_candidates"]
        .fn(spark, sf_dir)
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            F.lit(1).alias("hit"),
        )
        .distinct()
    )
    # F.sum over zero rows is NULL; coalesce so an EMPTY truth set yields
    # 0 >= 0 = TRUE (matching the oracle's literal), not NULL.
    return strong.join(cands, ["doc_a", "doc_b"], "left").agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        (
            F.lit(5)
            * F.coalesce(F.sum(F.coalesce(F.col("hit"), F.lit(0))), F.lit(0))
            >= F.lit(4) * F.count(F.lit(1))
        ).alias("recall_ok"),
    )


@register(
    "udf_simhash_separation",
    doc="SimHash fidelity check, hash-verified (SURVEY §3 F10/X1): over "
    "the exact candidate-pair graph, the mean 64-bit Hamming distance of "
    "strong pairs (Jaccard ≥ 0.4) must sit at least 4 bits below the "
    "mean of weak pairs (Jaccard < 0.15) — the monotone "
    "hamming-vs-jaccard relationship SimHash promises. Pair counts are "
    "SQL-exact; the separation flag is stated TRUE by the oracle, so a "
    "corrupted bit-vote kernel fails the hash compare.",
    tags=("dedup", "udf", "twin-check"),
    oracle=f"""
WITH jac AS ({_JACCARD_ORACLE})
SELECT CAST(count(CASE WHEN jaccard >= 0.4 THEN 1 END) AS BIGINT) AS n_near,
       CAST(count(CASE WHEN jaccard < 0.15 THEN 1 END) AS BIGINT) AS n_far,
       TRUE AS sep_ok
FROM jac
""",
)
def udf_simhash_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    pairs = _REG["docs_shingle_jaccard"].fn(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard"
    )
    sh = _REG["udf_simhash"].fn(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    pj = pairs.join(a, "doc_a").join(b, "doc_b").withColumn("ham", ham)
    # With either side empty the separation is undefined — vacuously TRUE
    # (the oracle states a literal TRUE), never NULL.
    return pj.agg(
        F.count(F.when(F.col("jaccard") >= 0.4, 1)).alias("n_near"),
        F.count(F.when(F.col("jaccard") < 0.15, 1)).alias("n_far"),
        F.coalesce(
            F.avg(F.when(F.col("jaccard") >= 0.4, F.col("ham"))) + F.lit(4.0)
            <= F.avg(F.when(F.col("jaccard") < 0.15, F.col("ham"))),
            F.lit(True),
        ).alias("sep_ok"),
    )


@register(
    "docs_fingerprint_integrity",
    doc="Rolling-hash fingerprint integrity, hash-verified (SURVEY §3 F9): "
    "byte-identical documents MUST share a fingerprint (determinism over "
    "the whole Spark plan — tokenize, xxhash64, modular fold), and "
    "distinct texts must not collide on this corpus. Duplicate-text "
    "group/pair counts are SQL-exact; the oracle states both flags TRUE, "
    "so a nondeterministic or collapsed hash fails the driver's compare.",
    tags=("text", "twin-check"),
    oracle="""
WITH dup AS (
  SELECT text, count(*) AS n FROM documents GROUP BY text HAVING count(*) > 1
)
SELECT CAST(count(*) AS BIGINT) AS n_dup_text_groups,
       CAST(coalesce(sum(n * (n - 1) / 2), 0) AS BIGINT) AS n_dup_pairs,
       TRUE AS dups_share_fingerprint,
       TRUE AS no_collisions
FROM dup
""",
)
def docs_fingerprint_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    fp = _REG["docs_fingerprint"].fn(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").join(fp, "doc_id")
    per_text = d.groupBy("text").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("fingerprint").alias("n_fp"),
    )
    dup = per_text.filter(F.col("n") > 1)
    dup_stats = dup.agg(
        F.count(F.lit(1)).alias("n_dup_text_groups"),
        F.coalesce(
            F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0)
        ).cast("long").alias("n_dup_pairs"),
        F.coalesce(F.max(F.col("n_fp")) == 1, F.lit(True)).alias(
            "dups_share_fingerprint"
        ),
    )
    distinct_stats = d.agg(
        (
            F.count_distinct("fingerprint") == F.count_distinct("text")
        ).alias("no_collisions")
    )
    return dup_stats.crossJoin(distinct_stats)


@register(
    "lsh_ann_recall",
    doc="Random-hyperplane LSH recall check, hash-verified (SURVEY §3 F8): "
    "the 8-band×4-bit bucketed candidates must recover ≥50% of the "
    "cos ≥ 0.5 pairs (OR-amplification predicts ≈0.83 at the decision "
    "boundary). The truth set reuses the guarded quadratic exact-cosine "
    "twin — correctness-scale only, like every oracle twin; the scale "
    "path is the LSH query itself. n_true_pairs is SQL-exact; recall_ok "
    "is integer arithmetic (2·hits ≥ truth), stated TRUE by the oracle.",
    tags=("vectors", "lsh", "twin-check"),
    oracle_twin=True,
    oracle=f"""
WITH pairs AS ({_REG["dedup_embedding_cosine"].oracle})
SELECT CAST(count(*) AS BIGINT) AS n_true_pairs, TRUE AS recall_ok
FROM pairs WHERE cos_sim >= 0.5
""",
)
def lsh_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_query_confs(spark)
    truth = (
        _REG["dedup_embedding_cosine"]
        .fn(spark, sf_dir)
        .filter(F.col("cos_sim") >= 0.5)
        .select("id_a", "id_b")
    )
    cands = (
        _REG["lsh_ann_candidates"]
        .fn(spark, sf_dir)
        .select("id_a", "id_b", F.lit(1).alias("hit"))
        .distinct()
    )
    # empty truth set → 0 >= 0 = TRUE (see docs_minhash_recall), not NULL
    return truth.join(cands, ["id_a", "id_b"], "left").agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        (
            F.lit(2)
            * F.coalesce(F.sum(F.coalesce(F.col("hit"), F.lit(0))), F.lit(0))
            >= F.count(F.lit(1))
        ).alias("recall_ok"),
    )
