"""Deduplication family (SURVEY.md §3 F10; BASELINE.json mandate).

- exact_dedup: deterministic keep-first via row_number (dropDuplicates is
  nondeterministic about WHICH duplicate survives — unacceptable when the
  output is hash-compared or replayed).
- canonical_row_hash: sha2 over a canonical string projection. Hash only
  int/string columns (float→string formatting differs across engines).
- minhash_signature_pairs: pure-DataFrame MinHash + LSH banding. Everything
  stays JVM-side (xxhash64 + hash-agg); no Python boundary. At 100 TB the
  band-bucket join replaces the quadratic pairwise join: candidates per
  band-bucket only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, subset: list[str], order_by: list[Column]) -> DataFrame:
    """Keep exactly one row per ``subset`` key: the first under ``order_by``.

    Raises if the input already carries the internal rank column —
    ``withColumn`` would silently overwrite it and ``drop`` would then
    delete the caller's data (the hazard topk_per_group guards the same
    way)."""
    if "__rn" in df.columns:
        raise ValueError(
            "exact_dedup: input already has a '__rn' column; rename it "
            "first (it would be silently overwritten and dropped)"
        )
    w = Window.partitionBy(*subset).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def canonical_row_hash(cols: list[str]) -> Column:
    """sha256 hex of an INJECTIVE canonical row encoding (engine-portable).

    A naive separator join (``concat_ws('|', ...)``) is not injective:
    ``concat_ws`` silently drops NULL columns (``("a", NULL)`` ≡
    ``(NULL, "a")``) and a separator occurring inside a value shifts
    column boundaries (``("a|b", "c")`` ≡ ``("a", "b|c")``) — silent
    false-duplicate data loss. Instead each column encodes as a prefix
    code: ``'N'`` for NULL, ``'V' || sha256(value)`` otherwise. Pieces
    are fixed-shape and self-delimiting, so the concatenation is
    injective up to sha256 collision. DuckDB twin (oracle form)::

        sha256(concat(
          CASE WHEN c IS NULL THEN 'N'
               ELSE 'V' || sha256(CAST(c AS VARCHAR)) END, ...))
    """
    pieces = [
        F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.sha2(F.col(c).cast("string"), 256))
        )
        for c in cols
    ]
    return F.sha2(F.concat(*pieces), 256)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    min_jaccard: float = 0.05,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Returns (doc_a, doc_b, n_shared, jaccard) for pairs with
    jaccard ≥ ``min_jaccard`` (doc_a < doc_b; jaccard unrounded).

    ``max_df`` stop-lists hot shingles BEFORE the self-join: a shingle
    present in k docs contributes k² rows to the join, so one piece of
    boilerplate shared by 10⁵ docs would emit 10¹⁰ rows. Shingles with
    document frequency above the cap are removed from the shingle sets
    entirely (intersections AND sizes — classic stop-word semantics, so
    jaccard stays a true set similarity over the kept shingles). ``None``
    disables the cap.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles_col)).alias("sh")
    )
    if max_df is not None:
        w = Window.partitionBy("sh")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("inter") * F.lit(1.0) / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.id"))
        .join(sb, F.col("doc_b") == F.col("sb.id"))
        .filter(jac >= min_jaccard)
        .select("doc_a", "doc_b", F.col("inter").alias("n_shared"), jac.alias("jaccard"))
    )


def minhash_signature_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    num_hashes: int = 16,
    band_size: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Signature: for seed s, min over tokens of xxhash64(token, s). Banding:
    hash each run of ``band_size`` signature slots; docs sharing any band
    bucket become a candidate pair. Returns (id_a, id_b, n_shared_bands).

    ``max_bucket_size`` bounds the self-join fan-out at scale: a band bucket
    holding k docs emits k² candidate rows, so one degenerate bucket (e.g.
    boilerplate-heavy corpora where thousands of docs share a band) can
    dominate the whole job. Buckets larger than the cap are dropped — their
    members are near-identical to so many others that the remaining bands
    still recall them. ``None`` disables the cap (exact oracle twins).
    """
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a multiple of band_size "
            f"({band_size}); trailing signature slots would be silently "
            "dropped, lowering recall vs the configured width"
        )
    from transilien_api_etl_spark.functions.text import portable_token_hash
    from transilien_api_etl_spark.io import widen_small_scan

    # Single-row-group driver SFs plan ONE input split, so the expensive
    # map-side stage (tokenize + num_hashes seeded-md5 minima per doc,
    # computed in the partial aggregation BEFORE the groupBy exchange)
    # serializes on one task. Widen the doc scan to the session
    # parallelism first — guarded no-op on multi-split inputs (the 32-file
    # scale cache and any production layout), measured round 11 session 5
    # (BASELINE.md: sig-stage walls).
    df = widen_small_scan(df.sparkSession, df)
    tok = df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens_col)).alias("tok"))
    # Seeded permutation hashes via the portable md5 form (round 3 — was
    # seeded xxhash64): DuckDB computes the identical minima, so the whole
    # candidate set is SQL-exact and the registered query is hash-checked.
    sig_aggs = [
        F.min(portable_token_hash(F.concat(F.lit(f"{s}:"), F.col("tok")))).alias(
            f"h{s}"
        )
        for s in range(num_hashes)
    ]
    sigs = tok.groupBy("id").agg(*sig_aggs)
    n_bands = num_hashes // band_size
    # One pass, not a union of n_bands selects over the sigs aggregate:
    # each union branch would re-run the whole explode + num_hashes
    # min-aggregation unless Spark happens to reuse the exchange. Explode
    # an array of (band, slots…) structs instead — the expensive signature
    # aggregation is computed exactly once and the banding is a free
    # map-side generator on top of it.
    #
    # The bucket key is the band's slot TUPLE as band_size BIGINT columns,
    # NOT a comma-joined string: at 1 M docs the bucket cap window and the
    # self-join hash/compare ~4 M keys and ~10⁸–10⁹ matched rows, and
    # doing that over ~70-char strings was the measured round-7 bottleneck
    # (the string form never finished a 580 s probe; the integer form runs
    # the same data in ~100 s). Same key equality ⇒ identical pairs, so
    # the registered results are unchanged — only the key REPRESENTATION
    # differs, mirrored in the oracle SQL.
    slot_cols = [f"s{i}" for i in range(band_size)]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.col(f"h{b * band_size + i}").alias(slot_cols[i])
                for i in range(band_size)
            ],
        )
        for b in range(n_bands)
    ]
    banded = sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), *[F.col(f"bb.{s}") for s in slot_cols])
    if max_bucket_size is not None:
        sz = Window.partitionBy("band", *slot_cols)
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(sz))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a, b = banded.alias("a"), banded.alias("b")
    cond = (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id"))
    for s in slot_cols:
        cond = cond & (F.col(f"a.{s}") == F.col(f"b.{s}"))
    # MERGE hint on the self-join (round 12, guide §2.4/§3.1): the static
    # planner broadcast one side at driver SFs, and a BroadcastExchange
    # cannot share a shuffle stage with the probe side — so the final
    # min-agg + band explode + bucket-cap window ran TWICE (AQE's runtime
    # stage reuse only deduplicated the partial-min exchange below them).
    # Both sides of this join are the SAME plan already hash-partitioned
    # AND sorted on exactly the join keys by the bucket-cap window, so a
    # sort-merge join is sort-free and lets AQE reuse the whole banded
    # subtree: one signature pipeline, two cursors. Measured at sf0.1
    # (warm 3-rep medians, value-gated equal): 1.87 s -> 1.22 s;
    # shuffled-hash probed too (1.43 s — pays the hash table build).
    # Join strategy cannot change the matched pairs, and the driver
    # re-proves the hash at every SF.
    return (
        a.join(b.hint("merge"), cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
