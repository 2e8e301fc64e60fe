#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the declared DuckDB oracle SQL over the
same testdata tables and compare (schema-insensitively: columns sorted by
name, rows sorted by all columns, values compared with exact match for
strings/ints and tiny-epsilon for floats).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"COLS spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            try:
                af = av.astype(float)
                bf = bv.astype(float)
            except (TypeError, ValueError):
                return f"TYPE {c}: {av.dtype} vs {bv.dtype}"
            bad = ~((af - bf).abs() < 1e-9) & ~(af.isna() & bf.isna())
            if bad.any():
                i = bad.idxmax()
                return f"VAL {c}[{i}]: {af[i]} vs {bf[i]}"
        else:
            if av.dtype != bv.dtype:
                try:
                    av = av.astype(str)
                    bv = bv.astype(str)
                except (TypeError, ValueError):
                    return f"TYPE {c}: {a[c].dtype} vs {b[c].dtype}"
            bad = ~(av == bv) & ~(av.isna() & bv.isna())
            if bad.any():
                i = bad.idxmax()
                return f"VAL {c}[{i}]: {av[i]!r} vs {bv[i]!r} (dtypes {a[c].dtype}/{b[c].dtype})"
    # dtype parity warning (driver may be stricter)
    notes = []
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            notes.append(f"dtype({c}): {a[c].dtype} vs {b[c].dtype}")
    return "OK" + ("  [" + "; ".join(notes) + "]" if notes else "")


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])  # optional: restrict to named queries
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERR {e}")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK-MISSING {e}")
            n_bad += 1
            continue
        r = compare(got, want)
        print(f"{name:28s} {r}")
        if r.startswith("OK"):
            n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
