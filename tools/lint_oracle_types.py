#!/usr/bin/env python3
"""Dev-only oracle TYPE lint (no query execution, no Spark).

DuckDB plans every oracle SQL with `DESCRIBE` against views of the
test tables and flags any FINAL projection column whose type is
HUGEINT / UHUGEINT: those reach pandas as float64 while Spark emits
int64, so the driver's hasher sees "900.0" vs "900" and the gate goes
red (the q170_ivm_from_cdf class of bug). The fix is always
`cast(sum(x) as bigint)` in the oracle's final projection.

Usage: python3 tools/lint_oracle_types.py <sfDir> <oracle_sql.json>

Exit 0 = clean; exit 1 = at least one lint hit. Run from sbt test via
OracleTypeLintSpec (which dumps SparkEntry.oracleSql itself), and from
the dev loop after graft.Verify.

NOT part of the shipped Scala library (driver-side python is allowed
for dev verification only).
"""
import sys, os, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def main(sfdir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    n_bad = n_err = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            # A DESCRIBE failure is a lint failure too: the oracle SQL
            # must at least plan against the canonical tables.
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_err += 1
            continue
        bad = [(c, ty) for (c, ty, *_rest) in desc
               if ty.upper().split("(")[0] in BAD_TYPES]
        for c, ty in bad:
            print(f"LINT {name}: final column '{c}' has oracle type {ty} "
                  f"(pandas will deliver float64 vs Spark's int64 — "
                  f"wrap in cast(... as bigint))")
        n_bad += len(bad)
    print(f"== {len(oracle)} oracles, {n_bad} type lints, {n_err} errors ==")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
