#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over <sfDir>'s
tables, sorts columns by name, and compares values row-by-row.
"""
import sys, os, json, glob, subprocess
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(
                (v if not isinstance(v, np.ndarray) else v.tolist()), list)
                else (tuple(v.tolist()) if isinstance(v, np.ndarray) else v))
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table (e.g. MakeBigSf output)
            p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            ok = len(spark_df) >= 0
            print(f"ROWS {name}: rows={len(spark_df)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rowcount {len(spark_df)} != {len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                eq = np.isclose(af, bf, rtol=0, atol=0, equal_nan=True)
                exact = eq.all()
                close = np.isclose(af, bf, rtol=1e-12, atol=1e-9,
                                   equal_nan=True).all()
                if not exact:
                    bad = (c, "float-exact" if close else "float-diverged",
                           af[~eq][:3], bf[~eq][:3])
                    break
            else:
                av = a.to_numpy(dtype=object)
                bv = b.to_numpy(dtype=object)
                eq = np.array([x == y or (pd.isna(x) and pd.isna(y))
                               for x, y in zip(av, bv)])
                if not eq.all():
                    bad = (c, "value", av[~eq][:3], bv[~eq][:3])
                    break
        if bad:
            c, kind, sa, sb = bad
            print(f"FAIL {name}: col {c} [{kind}] spark={sa} duck={sb}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n== {n_pass} pass / {n_fail} fail / {n_rowsonly} rows-only ==")
    # un-skippable oracle-typing lint (q116 bug class): selftest first so a
    # broken lint cannot silently pass, then lint every committed oracle
    lint = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "oracle_lint.py")
    lint_ok = (
        subprocess.run([sys.executable, lint, "--selftest"]).returncode == 0
        and subprocess.run([sys.executable, lint, sf_dir,
                            out_dir]).returncode == 0)
    if not lint_ok:
        print("== oracle_lint FAILED ==")
    sys.exit(1 if (n_fail or not lint_ok) else 0)


if __name__ == "__main__":
    main()
