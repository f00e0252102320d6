#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (driver-side tooling only,
not part of the shipped library). Runs after `sbt "runMain graft.Verify"`:
for each dumped result, executes the oracle SQL in DuckDB over the same
parquet tables, sorts columns by name, and compares values exactly.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if hasattr(a, "__len__") and not isinstance(a, str):
        if len(a) != len(b):
            return False
        return all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    results = {}
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        try:
            got = norm(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
        except Exception as e:
            results[name] = {"status": "spark-read-failed", "err": str(e)[:200]}
            continue
        if name not in oracle:
            results[name] = {"status": "rows-only", "rows": len(got)}
            continue
        try:
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            results[name] = {"status": "oracle-failed", "err": str(e)[:200]}
            continue
        r = {"rows": len(got), "exp_rows": len(exp)}
        if list(got.columns) != list(exp.columns):
            r.update(status="schema-mismatch", got_cols=list(got.columns), exp_cols=list(exp.columns))
        elif len(got) != len(exp):
            r.update(status="rowcount-mismatch")
        else:
            mismatches = []
            for c in got.columns:
                ga, ea = got[c].tolist(), exp[c].tolist()
                bad = [i for i in range(len(ga)) if not values_equal(ga[i], ea[i])]
                if bad:
                    i = bad[0]
                    mismatches.append(f"{c}[{i}]: got={ga[i]!r} exp={ea[i]!r} ({len(bad)} bad)")
            r.update(status="match" if not mismatches else "value-mismatch",
                     mismatches=mismatches[:5])
        results[name] = r

    n_match = sum(1 for r in results.values() if r.get("status") == "match")
    n_rows_only = sum(1 for r in results.values() if r.get("status") == "rows-only")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_match} match, {n_rows_only} rows-only, "
          f"{len(results) - n_match - n_rows_only} FAILING, of {len(results)}")
    sys.exit(0 if n_match + n_rows_only == len(results) else 1)


if __name__ == "__main__":
    main()
