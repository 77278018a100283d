#!/usr/bin/env python3
"""Oracle output-typing lint — kills the q116 bug class.

Usage: python3 scripts/oracle_lint.py <sfDir> <verifyOutDir>

Inspects every oracle_sql.json entry's RESULT SCHEMA in DuckDB over
<sfDir>'s tables and fails on types Spark's hash compare can't represent
(fetchdf would hide the problem: pandas silently materializes HUGEINT as
float64, which is exactly how the driver's hash compare then diverges
from Spark's int64). Flagged:

- DECIMAL / HUGEINT columns (`sum(BIGINT)`, windowed sums, and `//` on
  them promote; the fix is CAST(... AS BIGINT) in the final select)
- UBIGINT columns, scalar or nested (no Spark counterpart; values past
  2^63 can never hash-match)

The schema comes from `DESCRIBE <final select>` — NO oracle executes, so
the lint costs the same at sf1 as at sf0.01 (executing the full corpus
replay here is what made the round-7 sf1 gate hang for an hour). Setup
statements before the final select (macro definitions) still run.

Generated-input oracles (nx_/mm_) read /tmp/graft_oracle_inputs, so run
`graft.Verify` first, same as check.py.

`--selftest` proves the lint can actually catch the bug class: a
deliberately-bad oracle (un-CAST sum(BIGINT) -> HUGEINT/DECIMAL) must be
flagged and a CAST-wrapped one must pass, through the same DESCRIBE
path as the real lint. check.py runs this before the real lint, so a
silently-broken lint fails the gate too.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD_MARKS = ("DECIMAL", "HUGEINT", "UBIGINT", "HALF")


def split_statements(sql):
    """Split on top-level semicolons only. A ';' inside a single-quoted
    string, a double-quoted identifier, a `--` line comment, or a
    `/* */` block comment stays intact (a mis-split would DESCRIBE a
    fragment and report a spurious ERR for that oracle)."""
    stmts, cur = [], []
    state = None  # None | "'" | '"' | '--' | '/*'
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        two = sql[i:i + 2]
        if state is None:
            if ch in ("'", '"'):
                state = ch
            elif two == "--":
                state = "--"
            elif two == "/*":
                state = "/*"
            elif ch == ";":
                stmts.append("".join(cur))
                cur = []
                i += 1
                continue
        elif state in ("'", '"'):
            if ch == state:
                state = None
        elif state == "--":
            if ch == "\n":
                state = None
        elif state == "/*":
            if two == "*/":
                cur.append(two)
                state = None
                i += 2
                continue
        cur.append(ch)
        i += 1
    stmts.append("".join(cur))
    return [s for s in stmts if s.strip()]


_TEMP_TABLE_RE = __import__("re").compile(
    r"^(\s*CREATE\s+(?:OR\s+REPLACE\s+)?TEMP(?:ORARY)?\s+)TABLE\b",
    __import__("re").IGNORECASE)


def result_schema(con, sql):
    """(name, type) pairs of the final statement, without executing it.

    Setup statements run so the final DESCRIBE can bind (macro
    definitions are metadata-only), EXCEPT `CREATE TEMP TABLE ... AS`
    stages, which are rewritten to TEMP VIEWs: a view binds with the
    identical result types but never executes its query — a temp-TABLE
    setup (q86's LSH pair join + recursive CC) otherwise runs the full
    corpus replay inside the lint, which at sf1 is an hour of silent
    background load per check.py invocation.
    """
    stmts = split_statements(sql)
    for s in stmts[:-1]:
        con.execute(_TEMP_TABLE_RE.sub(r"\1VIEW", s))
    return [(r[0], r[1]) for r in
            con.execute("DESCRIBE " + stmts[-1]).fetchall()]


def bad_fields(schema):
    return [(n, t) for n, t in schema
            if any(m in t.upper() for m in BAD_MARKS)]


def selftest():
    con = duckdb.connect()
    bad = result_schema(
        con, "SELECT sum(x) AS s FROM (VALUES (1::BIGINT)) t(x)")
    good = result_schema(
        con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1::BIGINT)) t(x)")
    ok = bool(bad_fields(bad)) and not bad_fields(good)
    # the splitter must not split on ';' inside comments, quoted strings,
    # or double-quoted identifiers
    tricky = ('CREATE MACRO f(x) AS x + 1 -- line; comment\n;'
              '/* block; comment */ SELECT f(1) AS "a;b", \'x;y\' AS s')
    split_ok = len(split_statements(tricky)) == 2
    ok = ok and split_ok
    print(f"SELFTEST {'PASS' if ok else 'FAIL'}: "
          f"bad oracle -> {bad_fields(bad)}, good oracle -> {bad_fields(good)}, "
          f"comment-aware split -> {split_ok}")
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
            schema = result_schema(con, oracle[name])
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
