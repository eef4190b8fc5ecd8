"""Named-query registry — the single source of truth the driver consumes.

Every implemented operator from SURVEY.md §3 registers here as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the ANSI/DuckDB oracle SQL the driver hash-compares against.

Conventions (FIXTURES.md "oracle-parity gotchas"):
- every computed column is aliased identically in Spark and SQL;
- aggregate doubles are ``round()``-ed (sum order differs between engines);
- rank/size/int-sum columns are cast so both engines emit BIGINT;
- every LIMIT query carries a unique tie-break key in its ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    # True for deliberately-quadratic correctness oracles of an approximate
    # scale path (e.g. exact all-pairs cosine backing the LSH ANN query).
    # These refuse to run above a row-count guard unless explicitly
    # overridden — they exist to validate, not to be the production path.
    oracle_twin: bool = False
    # bench-phase-2 watchdog cap (seconds) for this query's DuckDB oracle,
    # overriding the default 150 s. Set LOW for oracles that are known
    # asymptotically different from the Spark plan at bench scale (e.g. the
    # unrolled-CTE kmeans chains, the quadratic NOT EXISTS prune): a
    # timeout at 60 s certifies ">= cap" just as well as one at 150 s and
    # returns 90 s of budget to queries that CAN be measured.
    oracle_cap_s: float | None = None
    # Bench-scale corpus variant (VERDICT r7 task 2). When set, bench.py's
    # compute-bound phase times bench_fn/bench_oracle INSTEAD of fn/oracle
    # — both sides read the same reduced corpus, so the ratio still
    # compares equal computations. The variant MUST be semantically
    # identical to fn on every driver testdata dir (it may only bite on
    # the amplified scale cache); tests/test_bench_variants.py asserts
    # that equivalence. The driver's correctness gate always checks
    # fn/oracle — the variant exists only so an output-bound row (minhash:
    # Θ(candidate pairs) ≈ 1.1e8 at the full 1 M-doc cache) doesn't spend
    # ~210 s of the 1 200 s bench budget re-proving a growth law that
    # BASELINE.md already records at 1 M and 2 M docs.
    bench_fn: QueryFn | None = None
    bench_oracle: str | None = None
    # True for the bench rows that materialize multi-GB intermediates
    # (minhash candidate pairs, the SemDeDup gram prune, PQ encode at
    # 1 M vectors). bench.py times every light row BEFORE these, so their
    # page-cache eviction can't inflate the light rows' graded medians
    # (VERDICT r7 task 1: 6 over-2× readings on byte-identical plans).
    bench_heavy: bool = False
    # Human-readable note for queries whose oracle comparison is expected
    # to diverge by design (e.g. an ANN path graded against an exact-truth
    # oracle under a CI-asserted recall floor). drive_contract.py copies it
    # into the correctness artifact so a reader can tell the documented
    # case from a regression without SURVEY archaeology (VERDICT r7 task 4).
    by_design: str | None = None
    # True for oracles measured 25-100x SLOWER than their Spark plan at
    # bench scale (as-of 23-50 s, sessionize 47-53 s vs sub-2 s Spark —
    # BASELINE.md rounds 7-9): bench.py times these LAST in the oracle
    # pass, because when the budget dies early their capped lower bound
    # (ratio < 0.1) is decisive anyway, while a skipped twin/normal
    # oracle loses a graded deliverable (observed round 9: a degraded-box
    # run spent its budget on asof+sessionize and skipped 14 oracles
    # including all three twins).
    oracle_heavy: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
    oracle_twin: bool = False,
    oracle_cap_s: float | None = None,
    bench_fn: QueryFn | None = None,
    bench_oracle: str | None = None,
    bench_heavy: bool = False,
    by_design: str | None = None,
    oracle_heavy: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            tags=tags,
            bench=bench,
            oracle_twin=oracle_twin,
            oracle_cap_s=oracle_cap_s,
            bench_fn=bench_fn,
            bench_oracle=bench_oracle,
            bench_heavy=bench_heavy,
            by_design=by_design,
            oracle_heavy=oracle_heavy,
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}
