"""Composite operators Spark lacks natively (SURVEY.md §3/§5).

Each is a *recipe* over built-in DataFrame ops — no custom Catalyst rules
needed (SURVEY §5): the plans stay fully visible to the optimizer
(pushdown, AQE, broadcast) and whole-stage codegen.
"""

from transilien_api_etl_spark.operators.delays import (  # noqa: F401
    delay_board,
    delay_stats,
    match_passages,
    with_delay,
)
from transilien_api_etl_spark.operators.dedup import (  # noqa: F401
    canonical_row_hash,
    exact_dedup,
    minhash_signature_pairs,
)
from transilien_api_etl_spark.operators.joins import asof_join, range_join  # noqa: F401
from transilien_api_etl_spark.operators.scd import (  # noqa: F401
    as_of_view,
    current_view,
    scd2_merge,
)
from transilien_api_etl_spark.operators.sessionize import sessionize  # noqa: F401
from transilien_api_etl_spark.operators.skew import (  # noqa: F401
    salted_agg,
    salted_join,
    with_salt,
)
from transilien_api_etl_spark.operators.topk import topk_global, topk_per_group  # noqa: F401
