"""Behavioral invariants for the training-data hygiene ops (SURVEY §3 F9):
PII scrubbing must remove every planted token, and the repetition filter
must keep healthy docs while flagging degenerate ones."""

from __future__ import annotations

import pyspark.sql.functions as F

from transilien_api_etl_spark import plans

from .conftest import SF_SMOKE


def test_pii_scrub_removes_everything(spark):
    out = plans.queries()["docs_pii_scrub"](spark, SF_SMOKE).toPandas()
    # One email + one phone + one IPv4 planted per doc; all must be found...
    assert (out["emails_redacted"] == out["n_docs"]).all()
    assert (out["phones_redacted"] == out["n_docs"]).all()
    assert (out["ips_redacted"] == out["n_docs"]).all()
    # ...and none may survive the scrub.
    assert (out["residual_pii_docs"] == 0).all()


def test_repetition_metrics_bounds_and_flags(spark):
    out = plans.queries()["docs_repetition_metrics"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    # Shares are well-defined ratios.
    for c in ("distinct_ratio", "top_token_share", "top_bigram_share"):
        assert (out[c] > 0).all() and (out[c] <= 1).all()
    # The synthetic corpus is word soup over a small vocabulary: no doc
    # should degenerate to a single repeated bigram.
    assert (out["top_bigram_share"] < 1).all()
    # Flag semantics: keep == conjunction of the three thresholds.
    expect = (
        (out["distinct_ratio"] >= 0.2)
        & (out["top_token_share"] <= 0.3)
        & (out["top_bigram_share"] <= 0.18)
    )
    assert (out["keep"] == expect).all()


def test_repetition_flags_degenerate_doc(spark):
    # A degenerate doc ("spam spam spam ...") must be dropped by the same
    # thresholds the registered query applies.
    df = spark.createDataFrame(
        [(1, " ".join(["spam"] * 50)), (2, " ".join(f"w{i}" for i in range(50)))],
        "doc_id long, text string",
    )
    toks = F.split("text", " ")
    m = df.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("distinct_ratio"),
    ).toPandas().set_index("doc_id")
    assert m.loc[1, "distinct_ratio"] < 0.2  # dropped
    assert m.loc[2, "distinct_ratio"] >= 0.2  # kept
