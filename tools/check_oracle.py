#!/usr/bin/env python3
"""Dev-only harness that mimics the driver's correctness gate:
run graft.Verify output parquet vs DuckDB oracle_sql.json on the same
tables, compare values after sorting columns by name.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

NOT part of the shipped Scala library (driver-side python is allowed for
dev verification only).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, Decimal):
            return f"{v:f}"
        if isinstance(v, float):
            return f"{v:.17g}"
        if pd.isna(v) if not isinstance(v, (list, tuple, set, dict)) else False:
            return "NULL"
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(canon)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Subset runs: only skip queries NOT named in SPARK_GRAFT_ONLY — a
    # requested query with no output (failed dump, typo'd name) must
    # still FAIL, else a subset run can report success having checked
    # nothing.
    only = {n.strip() for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
            if n.strip()}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq_dir = f"{outdir}/{name}"
        files = glob.glob(f"{pq_dir}/*.parquet")
        if not files:
            if only and name not in only:
                continue  # not part of this subset run
            print(f"FAIL {name}: no spark output at {pq_dir}")
            n_fail += 1
            continue
        try:
            got_raw = pd.read_parquet(pq_dir)
            want_raw = con.execute(sql).fetchdf()
            got = norm(got_raw)
            want = norm(want_raw)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        # Oracle-type drift guard (the q170 class): DuckDB HUGEINT
        # (uncast sum(BIGINT)) arrives through pandas as float64 while
        # Spark emits int64; the %.17g canonicalization below would
        # mask it ("900.0" -> "900") even though the driver's stricter
        # hasher does not. Flag integral-vs-float dtype mismatches in
        # either direction BEFORE canonicalizing.
        drift = []
        for c in set(got_raw.columns) & set(want_raw.columns):
            gi = pd.api.types.is_integer_dtype(got_raw[c])
            wi = pd.api.types.is_integer_dtype(want_raw[c])
            gf = pd.api.types.is_float_dtype(got_raw[c])
            wf = pd.api.types.is_float_dtype(want_raw[c])
            if (gi and wf) or (gf and wi):
                drift.append(f"{c}: spark={got_raw[c].dtype} duckdb={want_raw[c].dtype}")
        if drift:
            print(f"FAIL {name}: oracle type drift (cast the oracle "
                  f"projection): {'; '.join(sorted(drift))}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duckdb={list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)}")
            n_fail += 1
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(got)} rows differ; first diffs:")
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  spark : {got.loc[i].to_dict()}")
                print(f"  duckdb: {want.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
