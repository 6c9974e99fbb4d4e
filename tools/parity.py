#!/usr/bin/env python3
"""Dev-only oracle-parity checker mirroring the driver's t2 gate
(SURVEY.md §5.2.1). NOT part of the shipped library or `sbt test` — uses
the driver-side python stack (duckdb/pyarrow) purely as local tooling.

usage: parity.py <sfDir> <outDir> [key ...]
  <outDir> is what `graft.Verify <sfDir> <outDir>` wrote: one parquet dir
  per query + oracle_sql.json. Compares row-by-row (columns sorted by
  name, row order as produced) and exits nonzero on any mismatch.
"""
import sys, json, glob, math, datetime, decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(x):
    """Canonicalize a cell for exact comparison."""
    if x is None:
        return None
    if isinstance(x, float):
        return None if math.isnan(x) else x
    if isinstance(x, decimal.Decimal):
        return x  # Decimal == Decimal is numeric
    if isinstance(x, (list, tuple)):
        return tuple(canon(v) for v in x)
    tn = type(x).__name__
    if tn in ("ndarray",):
        return tuple(canon(v) for v in x.tolist())
    if tn in ("Timestamp", "datetime"):
        return str(x)[:26]
    if tn in ("date",):
        return str(x)
    if hasattr(x, "item"):  # numpy scalars
        return canon(x.item())
    return x


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    fail = 0
    for k in sorted(oracle):
        if only and k not in only:
            continue
        files = sorted(glob.glob(f"{out}/{k}/*.parquet"))
        if not files:
            print(f"[MISS]  {k}: no spark output under {out}/{k}")
            fail += 1
            continue
        sp = pq.read_table(files[0]).to_pandas()
        try:
            # arrow fetch preserves DECIMAL and DATE (df() would collapse
            # them to float64 / datetime64)
            du = con.execute(oracle[k]).arrow().to_pandas()
        except Exception as e:
            print(f"[OERR]  {k}: {type(e).__name__}: {e}")
            fail += 1
            continue
        sp, du = sp[sorted(sp.columns)], du[sorted(du.columns)]
        if list(sp.columns) != list(du.columns):
            print(f"[COLS]  {k}: spark={list(sp.columns)} duck={list(du.columns)}")
            fail += 1
            continue
        if len(sp) != len(du):
            print(f"[ROWS]  {k}: spark={len(sp)} duck={len(du)}")
            fail += 1
            continue
        bad = None
        for c in sp.columns:
            a, b = sp[c].tolist(), du[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                cx, cy = canon(x), canon(y)
                if cx != cy and not (cx is None and cy is None):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            print(f"[DIFF]  {k}: col={bad[0]} row={bad[1]} "
                  f"spark={bad[2]!r} duck={bad[3]!r}")
            fail += 1
        else:
            print(f"[OK]    {k} ({len(sp)} rows)")
    print(f"-- {fail} failures" if fail else "-- all green")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
