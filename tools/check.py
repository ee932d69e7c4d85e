#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare values (columns sorted by name, exact equality)."""
import json, subprocess, sys, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
RUN_SPARK = os.environ.get("SKIP_SPARK", "") != "1"
# ONLY=q1,q2 restricts the oracle pass to named queries (e.g. to top up an
# existing CHECK_JSON artifact with newly added queries without re-running
# the full multi-hour DuckDB pass); with MERGE_JSON=path the restricted
# verdicts are merged into that artifact instead of replacing it.
ONLY = set(filter(None, os.environ.get("ONLY", "").split(",")))

if RUN_SPARK:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

def emit(q, v):
    ok = v.startswith("OK") or v.startswith("rows-only") or v.startswith("gated")
    print(f"{'PASS' if ok else 'FAIL':4} {q:24} {v}", flush=True)

def load_optional(path):
    # Absent file = legacy Verify output -> gates degrade to rows-only.
    # A PRESENT but unreadable file must fail loudly: silently dropping
    # the gates is the exact degradation they were added to eliminate.
    try:
        f = open(path)
    except FileNotFoundError:
        return {}
    with f:
        return json.load(f)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# No-oracle minimum gates: row-count bound SQL (one row: lo, hi) plus
# the declared Spark schema DDL, compared against the actual DDL the
# Verify run captured. Older Verify outputs lack these files -> the
# check degrades to the legacy rows-only behavior.
row_bounds = load_optional(f"{OUT}/row_bounds.json")
expected_schema = load_optional(f"{OUT}/expected_schema.json")
actual_schema = load_optional(f"{OUT}/schemas.json")
con = duckdb.connect()
# DUCKDB_THREADS=N bounds the oracle's parallelism so a background heavy
# oracle doesn't starve a concurrent sbt build on the same box.
if os.environ.get("DUCKDB_THREADS"):
    con.sql(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
# DUCKDB_MEM bounds the hash-table memory before spilling; an unbounded
# oracle that would spill the disk full should instead fail loudly.
if os.environ.get("DUCKDB_MEM"):
    con.sql(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
for t in tables:
    p = f"{SF_DIR}/{t}.parquet"
    # driver testdata tables are single files; ScaleUp lakes (target/sf1)
    # are parquet DIRECTORIES — glob those
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.reset_index(drop=True)

results = {}
# A query that threw during Verify writes no directory at all — surface
# it as MISSING instead of silently shrinking the denominator.
present = {n.rstrip("/").split("/")[-1] for n in glob.glob(f"{OUT}/*/")}
for q in sorted(set(oracle) - present):
    if ONLY and q not in ONLY:
        continue
    results[q] = "MISSING (query errored during Verify?)"; emit(q, results[q])
for name in sorted(glob.glob(f"{OUT}/*/")):
    qname = name.rstrip("/").split("/")[-1]
    if ONLY and qname not in ONLY:
        continue
    try:
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{name}/*.parquet"))]))
    except Exception as e:
        results[qname] = f"SPARK-READ-FAIL {e}"; emit(qname, results[qname]); continue
    if qname not in oracle:
        n = len(spark_df)
        if qname in row_bounds or qname in expected_schema:
            probs = []
            lo = hi = None
            if qname in row_bounds:
                try:
                    lo, hi = con.sql(row_bounds[qname]).fetchone()
                    if not (lo <= n <= hi):
                        probs.append(f"ROWS-OUT-OF-BOUNDS rows={n} bound=[{lo},{hi}]")
                except Exception as e:
                    probs.append(f"BOUND-SQL-FAIL {str(e)[:160]}")
            if qname in expected_schema:
                got = actual_schema.get(qname)
                if got is None:
                    # outDir holds this query's dump but schemas.json (written
                    # whole each Verify run) lacks it: a restricted Verify
                    # overwrote a fuller run's capture — config error, not drift
                    probs.append("SCHEMA-UNCAPTURED (schemas.json lacks this query; "
                                 "rerun Verify without a name filter)")
                elif got != expected_schema[qname]:
                    probs.append(f"SCHEMA-DRIFT got={got!r} want={expected_schema[qname]!r}")
            if probs:
                results[qname] = "; ".join(probs)
            else:
                results[qname] = f"gated rows={n} bound=[{lo},{hi}] schema-ok"
        else:
            results[qname] = f"rows-only rows={n}"
        emit(qname, results[qname]); continue
    try:
        duck_df = norm(con.sql(oracle[qname]).to_df())
    except Exception as e:
        results[qname] = f"ORACLE-FAIL {str(e)[:200]}"; emit(qname, results[qname]); continue
    if list(spark_df.columns) != list(duck_df.columns):
        results[qname] = f"SCHEMA-MISMATCH spark={list(spark_df.columns)} duck={list(duck_df.columns)}"; emit(qname, results[qname]); continue
    if len(spark_df) != len(duck_df):
        results[qname] = f"ROWS-MISMATCH spark={len(spark_df)} duck={len(duck_df)}"; emit(qname, results[qname]); continue
    bad = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        # Driver hashes TYPED output: a DuckDB HUGEINT (-> float64/object in
        # pandas) vs Spark BIGINT (int64) mismatches even when values agree.
        # Compare dtype kind for numeric columns; dates/strings normalize
        # differently between pandas readers so value equality suffices there.
        ka, kb = a.dtype.kind, b.dtype.kind
        if (ka in "iuf" or kb in "iuf") and ka != kb:
            bad.append(f"{c}: DTYPE spark={a.dtype} duck={b.dtype}")
            continue
        try:
            an, bn = pd.to_numeric(a, errors="raise"), pd.to_numeric(b, errors="raise")
            eq = ((an == bn) | (an.isna() & bn.isna())).all()
        except Exception:
            eq = ((a.astype(str) == b.astype(str)) | (a.isna() & b.isna())).all()
        if not eq:
            ia = next(i for i in range(len(a)) if not ((pd.isna(a[i]) and pd.isna(b[i])) or a[i] == b[i]))
            bad.append(f"{c}[{ia}]: spark={a[ia]!r} duck={b[ia]!r}")
    results[qname] = "OK rows=%d" % len(spark_df) if not bad else "VALUE-MISMATCH " + "; ".join(bad[:3])
    emit(qname, results[qname])

okc = sum(1 for v in results.values()
          if v.startswith("OK") or v.startswith("rows-only") or v.startswith("gated"))
print(f"== {okc}/{len(results)} pass")

# Optional committable artifact (CHECK_JSON=path): per-query verdicts in
# the driver's CORRECTNESS shape, so a triple-scale gate run leaves three
# diffable files instead of scrollback.
if os.environ.get("CHECK_JSON"):
    def row(v):
        if v.startswith("OK"):
            return {"rows_match": True, "schema_match": True, "hash_match": True,
                    "rows": int(v.split("rows=")[1]), "err": None}
        if v.startswith("gated"):
            # no value oracle, but row-bound + schema gates both held
            rows = int(v.split("rows=")[1].split(" ")[0])
            bound = v.split("bound=")[1].split(" ")[0]
            bound = None if "None" in bound else json.loads(bound)
            return {"rows_match": True, "schema_match": True, "hash_match": None,
                    "rows": rows, "row_bound": bound, "err": "no_oracle"}
        if v.startswith("rows-only"):
            return {"rows_match": None, "schema_match": None, "hash_match": None,
                    "rows": int(v.split("rows=")[1]), "err": "no_oracle"}
        return {"rows_match": False, "schema_match": False, "hash_match": False,
                "rows": None, "err": v[:300]}
    queries = {q: row(v) for q, v in sorted(results.items())}
    if os.environ.get("MERGE_JSON"):
        prior = json.load(open(os.environ["MERGE_JSON"]))
        queries = {**prior["queries"], **queries}
    n_pass = sum(1 for v in queries.values()
                 if v["hash_match"] or v["err"] == "no_oracle")
    payload = {"sf_dir": SF_DIR, "n_pass": n_pass, "n_total": len(queries),
               "queries": queries}
    with open(os.environ["CHECK_JSON"], "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {os.environ['CHECK_JSON']} ({n_pass}/{len(queries)})")
