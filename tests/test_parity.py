"""Oracle parity for every registered query, mirroring the driver's
CORRECTNESS gate at sf0.01 (SURVEY.md §6.2)."""

from __future__ import annotations

import pytest

from transilien_api_etl_spark import plans

from .conftest import SF_ORACLE
from .parity import compare_frames

ORACLES = plans.oracle_sql()
ALL = sorted(plans.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, duck, name):
    fn = plans.queries()[name]
    sdf = fn(spark, SF_ORACLE)
    spark_pdf = sdf.toPandas()
    oracle = ORACLES.get(name)
    if oracle is None:
        # rows-only check, like the driver's weaker gate
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(oracle).df()
    errs = compare_frames(spark_pdf, duck_pdf, name)
    assert not errs, "\n".join(errs)
