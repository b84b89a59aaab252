#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the testdata tables and compare with the Spark results dumped by
graft.Verify. Columns sorted by name, rows sorted, exact value compare
(floats via repr after round-trip).

The committed record (CORRECTNESS_SELF.json) uses the driver's own
per-query schema — {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err} — so an empty driver-side CORRECTNESS_r{N}.json diffs
mechanically against the self-record.

The record is written INCREMENTALLY (atomic tmp+rename after every
query), so a compare killed at any point still leaves every completed
query's row — the all-at-the-end form is why five consecutive driver
rounds recorded {} when the runner died. A partial record carries
"partial": true; the final write drops it."""
import json, sys, glob, os, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def rec(rows_match=None, schema_match=None, hash_match=None,
        spark_rows=None, oracle_rows=None, err=None, jitter_ok=None,
        sec=None):
    r = {"rows_match": rows_match, "schema_match": schema_match,
         "hash_match": hash_match, "spark_rows": spark_rows,
         "oracle_rows": oracle_rows, "err": err}
    # only present on the float-jitter branch: values differ within the
    # repr round-trip tolerance, counted ok but NOT hash-identical
    if jitter_ok is not None:
        r["jitter_ok"] = jitter_ok
    # per-query compare wall-seconds (oracle SQL + compare): the slow-
    # oracle watchlist — round-13 found 30-60 min compositor oracles
    # were starving every driver correctness window
    if sec is not None:
        r["sec"] = round(sec, 2)
    return r

def write_record(record_path, sf_dir, n_ok, n_bad, record, partial):
    if not record_path:
        return
    body = {"sf_dir": sf_dir, "n_ok": n_ok, "n_bad": n_bad,
            "queries": dict(sorted(record.items()))}
    if partial:
        body["partial"] = True
    tmp = record_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(body, f, indent=1)
    os.replace(tmp, record_path)

def main(sf_dir, out_dir, record_path=None):
    record = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # ORACLE_THREADS caps DuckDB's parallelism so a heavy sf0.1-tier
    # compare doesn't starve the box running the Spark work beside it
    if os.environ.get("ORACLE_THREADS"):
        con.execute(f"PRAGMA threads={int(os.environ['ORACLE_THREADS'])}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # incremental flush closure: reads the CURRENT n_ok/n_bad/record at
    # call time; called after every per-query verdict
    flush = lambda: write_record(record_path, sf_dir, n_ok, n_bad, record, True)
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output")
            record[name] = rec(err="missing: no spark output"); n_bad += 1; flush(); continue
        try:
            got = canon(con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            record[name] = rec(err=f"error: {e}"[:300]); n_bad += 1; flush(); continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            record[name] = rec(rows_match=len(got) == len(want), schema_match=False,
                               spark_rows=len(got), oracle_rows=len(want),
                               err=f"schema: spark={list(got.columns)} oracle={list(want.columns)}"[:300])
            n_bad += 1; flush(); continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            record[name] = rec(rows_match=False, schema_match=True,
                               spark_rows=len(got), oracle_rows=len(want))
            n_bad += 1; flush(); continue
        if got.equals(want):
            print(f"OK       {name} ({len(got)} rows, {time.time() - t0:.1f}s)")
            record[name] = rec(rows_match=True, schema_match=True, hash_match=True,
                               spark_rows=len(got), oracle_rows=len(want),
                               sec=time.time() - t0)
            n_ok += 1; flush(); continue
        # tolerate tiny float jitter, flag everything else
        import pandas as pd
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if a.equals(b):
                continue
            try:
                import numpy as np
                if np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True):
                    diff_cols.append((c, "float-jitter")); continue
            except Exception:
                pass
            diff_cols.append((c, "MISMATCH"))
        hard = [c for c, k in diff_cols if k == "MISMATCH"]
        if hard:
            print(f"VALUES   {name}: mismatched cols {hard}")
            for c in hard[:2]:
                neq = got[c] != want[c]
                print(f"   {c}: spark={got[c][neq].head(3).tolist()} oracle={want[c][neq].head(3).tolist()}")
            record[name] = rec(rows_match=True, schema_match=True, hash_match=False,
                               spark_rows=len(got), oracle_rows=len(want),
                               err=f"value_mismatch: {hard}"[:300], sec=time.time() - t0)
            n_bad += 1; flush()
        else:
            print(f"OK~      {name} (float jitter only: {[c for c,_ in diff_cols]})")
            # hash_match=False: the values are NOT bit-identical, only
            # within tolerance — jitter_ok carries the ok-vs-ok~ distinction
            record[name] = rec(rows_match=True, schema_match=True, hash_match=False,
                               jitter_ok=True,
                               spark_rows=len(got), oracle_rows=len(want),
                               err=f"float_jitter: {[c for c,_ in diff_cols]}"[:300],
                               sec=time.time() - t0)
            n_ok += 1; flush()
    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            print(f"{'ROWSONLY' if n > 0 else 'EMPTY!  '} {name} ({n} rows)")
            record[name] = rec(rows_match=n > 0, spark_rows=n,
                               err=None if n > 0 else "empty")
            if n == 0: n_bad += 1
            flush()
    print(f"\n{n_ok} ok, {n_bad} bad")
    # final write drops the partial flag
    write_record(record_path, sf_dir, n_ok, n_bad, record, False)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify",
                  sys.argv[3] if len(sys.argv) > 3 else None))
