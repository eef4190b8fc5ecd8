"""Drive the repo's driver contract end-to-end, as the harness would:
import __spark_entry__ from a foreign cwd, smoke entry(), then run every
queries()[name] at sf0.01 against oracle_sql()[name] via DuckDB.

SPARK_GRAFT_CONTRACT_SF overrides the data dir (e.g. sf0.1 for the
committed per-round parity artifact — VERDICT r6 task 3);
SPARK_GRAFT_CONTRACT_OUT, if set, additionally writes the per-query
results as driver-format JSON ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}})."""
import hashlib, json, os, sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as ent
import duckdb
from transilien_api_etl_spark.plans.registry import REGISTRY as _REGISTRY
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").config("spark.ui.enabled","false")
         .config("spark.sql.session.timeZone","America/New_York")  # hostile tz: queries must self-pin UTC
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = ent.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duckdb_contract_spill.tmp'")  # never spill into the CWD/repo
SF = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.01")

# Known 0-row-at-one-SF queries (VERDICT r10 task 6b): both are selective
# HAVING/EXCEPT shapes whose driver-SF result is non-empty — the sf0.1
# empties are a data-distribution artifact of that SF's value ranges, and
# the note (emitted into the artifact whenever a 0-row MATCH occurs)
# points a reader at the round where the same query matched non-trivially.
_ZERO_ROW_NOTES = {
    "q11_important_part_value": "376 rows MATCH at sf0.01 (CORRECTNESS_r04); "
    "at sf0.1 the 0.1%-of-total cut exceeds every one of 12207 per-part "
    "values (the threshold scales with part count: ~12x the mean there vs "
    "~1.2x over 1160 parts at sf0.01)",
    "setop_except": "5 rows MATCH at sf0.01 (CORRECTNESS_r01/r05/r09); at "
    "sf0.1 every customer nationkey also has a supplier with acctbal>5000, "
    "so EXCEPT is legitimately empty",
}
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def vhash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(repr(v) for v in r) for r in pdf.itertuples(index=False))
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:12]

qs, os_ = ent.queries(), ent.oracle_sql()
only = set(sys.argv[1:])  # optional: pass query names to check a subset
if only:
    unknown = only - set(qs)
    assert not unknown, f"unknown query names: {sorted(unknown)}"
    qs = {k: v for k, v in qs.items() if k in only}
ok = bad = 0
report = {}
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        spdf = fn(spark, SF).toPandas()
    except Exception as e:  # the real driver records ERR and moves on
        print(f"  ERR {name}: {type(e).__name__}: {str(e)[:140]} [{time.time()-t0:.1f}s]")
        report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                        "spark_rows": None, "oracle_rows": None,
                        "err": f"{type(e).__name__}: {str(e)[:200]}"}
        bad += 1
        continue
    if name not in os_:
        print(f"  rows-only {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
        report[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                        "spark_rows": len(spdf), "oracle_rows": None, "err": None}
        ok += 1; continue
    try:
        dpdf = con.execute(os_[name]).df()
    except Exception as e:
        print(f"  ORACLE-ERR {name}: {type(e).__name__}: {str(e)[:140]} [{time.time()-t0:.1f}s]")
        report[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                        "spark_rows": len(spdf), "oracle_rows": None,
                        "err": f"oracle: {type(e).__name__}: {str(e)[:200]}"}
        bad += 1
        continue
    # normalize timestamps to isoformat strings for hashing
    import pandas as pd
    for p in (spdf, dpdf):
        for c in p.columns:
            if str(p[c].dtype).startswith("datetime"):
                p[c] = p[c].astype("datetime64[us]").map(lambda x: x.isoformat())
    m = (len(spdf)==len(dpdf), sorted(spdf.columns)==sorted(dpdf.columns), vhash(spdf)==vhash(dpdf))
    status = "MATCH" if all(m) else f"MISMATCH {m}"
    report[name] = {"rows_match": m[0], "schema_match": m[1], "hash_match": m[2],
                    "spark_rows": len(spdf), "oracle_rows": len(dpdf), "err": None}
    # Self-describing artifact (VERDICT r7 task 4): a query registered with
    # a by_design note (e.g. the ANN row graded against an exact-truth
    # oracle under a CI-asserted recall floor) carries that note INTO the
    # JSON whenever it diverges, so a reader of the committed sf0.1 sweep
    # can tell the documented probabilistic case from a regression.
    _spec = _REGISTRY.get(name)
    if not all(m) and _spec is not None and _spec.by_design:
        report[name]["by_design"] = _spec.by_design
        status += " (by design — see 'by_design' in the artifact)"
    # A 0-row MATCH is a weak check (VERDICT r10 task 6b): flag it in the
    # artifact with the query's non-trivial row counts at the OTHER driver
    # SFs, so a sweep reader sees the green is a data-distribution
    # artifact of this SF, not a vacuous always-empty comparison.
    if all(m) and len(spdf) == 0:
        note = _ZERO_ROW_NOTES.get(name, "no known non-empty SF — verify")
        report[name]["zero_row_note"] = note
        status += " (0 rows — see 'zero_row_note')"
    print(f"  {status} {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
    ok += all(m); bad += not all(m)
out_path = os.environ.get("SPARK_GRAFT_CONTRACT_OUT")
if out_path:
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"# wrote {out_path}")
print(f"RESULT: {ok} ok, {bad} mismatched")
sys.exit(1 if bad else 0)
