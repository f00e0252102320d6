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


def col_kind(s: pd.Series) -> str:
    """Canonical dtype kind. The driver's hash is dtype-sensitive (121 vs
    121.0 hash differently), so the local mirror must be too: an oracle
    whose windowed sum(BIGINT) comes back HUGEINT->float64 must FAIL here,
    not slip through on Python int == float (the r17 tx_mix_budget trap)."""
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "m":
        return "timedelta"
    # object column: classify by first non-null element
    for v in s:
        if v is None:
            continue
        try:
            if pd.isna(v):
                continue
        except (TypeError, ValueError):
            pass
        import numbers
        if isinstance(v, bool) or type(v).__name__ == "bool_":
            return "bool"
        if isinstance(v, numbers.Integral):
            return "int"
        if isinstance(v, numbers.Real) and not isinstance(v, numbers.Integral):
            return "float"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        import decimal
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if hasattr(v, "__len__"):
            return "list"
        return type(v).__name__
    return "all-null"


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
    # dtype-strict: int vs float (or Decimal vs float) must NOT compare
    # equal — the driver's hash distinguishes them. numbers-ABC based so
    # numpy scalars INSIDE list columns are covered too (np.int64 is not
    # isinstance(int), but it IS numbers.Integral).
    import decimal
    import numbers
    def num_kind(v):
        if isinstance(v, (bool,)) or type(v).__name__ == "bool_":
            return "bool"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, numbers.Integral):
            return "int"
        if isinstance(v, numbers.Real):
            return "float"
        return None
    ka, kb = num_kind(a), num_kind(b)
    if ka is not None and kb is not None and ka != kb:
        return False
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
        dtype_bad = [
            f"{c}: got={col_kind(got[c])} exp={col_kind(exp[c])}"
            for c in got.columns
            if c in exp.columns
            and "all-null" not in (col_kind(got[c]), col_kind(exp[c]))
            and col_kind(got[c]) != col_kind(exp[c])
        ]
        if list(got.columns) != list(exp.columns):
            r.update(status="schema-mismatch", got_cols=list(got.columns), exp_cols=list(exp.columns))
        elif dtype_bad:
            r.update(status="dtype-mismatch", dtypes=dtype_bad)
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
