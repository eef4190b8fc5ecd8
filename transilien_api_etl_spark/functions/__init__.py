"""Column-expression helpers (SURVEY.md §3.8).

Everything here returns ``pyspark.sql.Column`` built from built-in
functions — JVM-side, codegen-able, never a Python UDF. The pandas-UDF
variants (for genuinely non-expressible logic) live in ``functions.udfs``.
"""

from transilien_api_etl_spark.functions.datetime_fns import (  # noqa: F401
    day_of_service,
    gtfs_clock_seconds,
    service_departure_ts,
)
from transilien_api_etl_spark.functions.strings import (  # noqa: F401
    normalize_station_id,
    numeric_id,
)
from transilien_api_etl_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from transilien_api_etl_spark.functions.text import (  # noqa: F401
    shingles,
    stopword_count,
    tokenize,
)
