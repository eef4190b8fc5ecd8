"""materialize_small — the guarded materialize-then-clean helper (VERDICT
r5 task 6): sink-backed queries round-trip their FINAL small result through
the driver so per-run staging dirs can be deleted; the row cap is what
keeps a future query edit from silently collecting a large distributed
result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transilien_api_etl_spark.io import materialize_small


def test_small_result_round_trips_values_and_schema(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("twice")
    )
    out = materialize_small(df)
    assert out.schema == df.schema
    assert sorted(r.twice for r in out.collect()) == [2 * i for i in range(100)]


def test_over_cap_raises_instead_of_collecting(spark):
    df = spark.range(50)
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        materialize_small(df, max_rows=10)


def test_empty_result_keeps_schema(spark):
    df = spark.range(10).filter(F.col("id") < 0)
    out = materialize_small(df)
    assert out.count() == 0
    assert out.schema == df.schema
