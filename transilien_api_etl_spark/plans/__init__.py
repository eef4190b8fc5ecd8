"""Query plans. Importing this package registers every named query."""

from transilien_api_etl_spark.plans import (  # noqa: F401  (import = registration)
    domain_q,
    events_q,
    functions_q,
    relational,
    relational_ext,
    streaming_q,
    text_q,
    udfs_q,
    vectors_q,
    windows,
)
from transilien_api_etl_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    bench_queries,
    oracle_sql,
    queries,
)
