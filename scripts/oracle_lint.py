#!/usr/bin/env python3
"""Oracle output-typing lint — kills the q116 bug class.

Usage: python3 scripts/oracle_lint.py <sfDir> <verifyOutDir>

Runs every oracle_sql.json entry in DuckDB over <sfDir>'s tables and
inspects the RESULT SCHEMA via Arrow (fetchdf would hide the problem:
pandas silently materializes HUGEINT as float64, which is exactly how the
driver's hash compare then diverges from Spark's int64). Fails on:

- decimal columns (DuckDB HUGEINT / DECIMAL — `sum(BIGINT)`, windowed
  sums, and `//` on them promote; the fix is CAST(... AS BIGINT) in the
  final select)
- unsigned int64 columns (UBIGINT has no Spark counterpart; values past
  2^63 can never hash-match)

Generated-input oracles (nx_/mm_) read /tmp/graft_oracle_inputs, so run
`graft.Verify` first, same as check.py.

`--selftest` proves the lint can actually catch the bug class: a
deliberately-bad oracle (un-CAST sum(BIGINT) → HUGEINT) must be flagged
and a CAST-wrapped one must pass. check.py runs this before the real
lint, so a silently-broken lint fails the gate too.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD_PREFIXES = ("decimal", "halffloat")


def bad_fields(schema):
    return [(f.name, str(f.type)) for f in schema
            if str(f.type).startswith(BAD_PREFIXES)
            or str(f.type) == "uint64"]


def selftest():
    con = duckdb.connect()
    bad = con.execute(
        "SELECT sum(x) AS s FROM (VALUES (1::BIGINT)) t(x)"
    ).fetch_arrow_table().schema
    good = con.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1::BIGINT)) t(x)"
    ).fetch_arrow_table().schema
    ok = bool(bad_fields(bad)) and not bad_fields(good)
    print(f"SELFTEST {'PASS' if ok else 'FAIL'}: "
          f"bad oracle -> {bad_fields(bad)}, good oracle -> {bad_fields(good)}")
    sys.exit(0 if ok else 1)


def main():
    if "--selftest" in sys.argv:
        selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_bad = n_err = 0
    for name in sorted(oracle):
        try:
            schema = con.execute(oracle[name]).fetch_arrow_table().schema
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            n_err += 1
            continue
        bad = bad_fields(schema)
        if bad:
            print(f"LINT {name}: un-CAST oracle output column(s): {bad}")
            n_bad += 1
    print(f"\n== {len(oracle)} oracles, {n_bad} typing violations, {n_err} errors ==")
    sys.exit(1 if (n_bad or n_err) else 0)


if __name__ == "__main__":
    main()
