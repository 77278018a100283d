#!/usr/bin/env python3
"""Re-materialize a testdata SF directory with multiple parquet row
groups per file (round-15 verdict task 2: every driver fixture file is
ONE row group, so every scan — and the codegen pipeline fused above
it — runs as one task at any core count, and the driver's 8-vs-32-core
scaling comparison measures nothing).

The rewrite is a faithful pyarrow round-trip of each file: identical
schema (including events.ts TIMESTAMP(NANOS)), identical row ORDER,
identical values, same snappy codec — only the row-group structure
changes (~128 groups per file, min 64 rows per group). The script
verifies round-trip equality (pyarrow Table.equals — bitwise column
data — plus schema equality) BEFORE replacing anything, copies the
original into <backupDir>, and swaps with an atomic rename.

Usage: python3 scripts/regroup_sf.py <sfDir> <backupDir>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
# Row groups cap a file's EFFECTIVE scan parallelism (empty byte-range
# splits produce no rows), so group count is sized per table by compute
# density — measured with interleaved A/B runs (graft.tools.AbFixture):
#
# - documents/embeddings (32): tokenize/minhash/vector pipelines fused
#   above these scans are CPU-heavy per byte — 32-way splits halved
#   q28/q06-class walls and kept winning down to ~17 KB splits.
# - lineitem (8): aggregate scans win big from 8-way (q06 0.48x,
#   q17 0.61x, q01 0.69x) and more groups only added per-group reader
#   overhead; 8 keeps tpch_q18's high-cardinality groupBy (zero
#   partial-agg reduction, shuffle rows scale with split count) at a
#   measured 1.03x.
# - events (16): window/session consumers read 0.9-1.06x at 32 groups;
#   16 halves the per-group overhead while keeping the wins.
# - orders and the dims (1): their consumers are cheap filter+join
#   scans where ANY parallel split LOSES — a high-cardinality groupBy
#   (q21: 15k customers over 150k rows) shuffles ~|input| partial rows
#   instead of |distinct| once split, measured q21 1.36-1.51x at every
#   multi-group setting. Serial preserves the r14 shape exactly.
#
# Every task parses the whole footer, so group counts also stay small
# enough (footer <= ~40 KB) that a 32-task stage does not burn
# ~100 ms/task re-parsing thrift metadata (measured at 129 groups).
TARGET_GROUPS = {
    "documents": 32, "embeddings": 32, "lineitem": 8, "events": 16,
    "orders": 1, "customer": 1, "supplier": 1, "part": 1,
    "nation": 1, "region": 1,
}
MIN_ROWS_PER_GROUP = 64


def main():
    sf_dir, backup_dir = sys.argv[1], sys.argv[2]
    os.makedirs(backup_dir, exist_ok=True)
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            print(f"[regroup] {t}: missing, skipped")
            continue
        orig = pq.read_table(path)
        n = orig.num_rows
        groups = TARGET_GROUPS[t]
        rg = max(MIN_ROWS_PER_GROUP, n // groups)
        tmp = path + ".regroup.tmp"
        # zstd, not snappy: multi-group snappy files grew ~40% from
        # per-group dictionary resets (lineitem 10.8 -> 15.0 MB); zstd
        # holds the rewrite near the original size (guide §6)
        pq.write_table(orig, tmp, row_group_size=rg,
                       compression="zstd", version="2.6")
        new = pq.read_table(tmp)
        if not (new.schema.equals(orig.schema) and new.equals(orig)):
            os.remove(tmp)
            raise SystemExit(f"[regroup] {t}: round-trip NOT identical — "
                             "aborting before replacing anything")
        bak = os.path.join(backup_dir, f"{t}.parquet")
        if not os.path.exists(bak):
            shutil.copy2(path, bak)
        os.chmod(path, 0o644)
        os.replace(tmp, path)
        os.chmod(path, 0o444)
        groups = pq.ParquetFile(path).metadata.num_row_groups
        print(f"[regroup] {t}: {n} rows -> {groups} row groups "
              f"({rg} rows/group), verified identical")


if __name__ == "__main__":
    main()
