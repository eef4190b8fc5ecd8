"""Sources & sinks (SURVEY.md §3.1 S2-S6).

- ``gtfs``: CSV scans with declared GTFS schemas + service-day resolution.
- ``realtime``: XML passage parsing (mapInPandas) + normalization.
- ``sinks``: partitioned parquet warehouse sink, idempotent upsert, JDBC.
"""

from transilien_api_etl_spark.sources.gtfs import (  # noqa: F401
    GTFS_SCHEMAS,
    load_gtfs,
    load_gtfs_table,
    scheduled_departures,
    services_active_on,
)
from transilien_api_etl_spark.sources.realtime import (  # noqa: F401
    RAW_PASSAGE_SCHEMA,
    normalize_passages,
    parse_passages,
    parse_passages_native,
)
