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
    """Canonicalize a cell for RENDER-SENSITIVE comparison (mirrors the
    driver's hash, which canonicalizes by string rendering: Decimal
    '947.0000' != float '947.0', int 900 != double 900.0). VERDICT r1
    'What's wrong' §1: numeric equality here let 13 driver hash-fails
    slip past the local gate."""
    if x is None:
        return None
    if isinstance(x, bool):
        return ("b", x)
    if isinstance(x, float):
        return None if math.isnan(x) else ("f", repr(x))
    if isinstance(x, int):
        return ("i", str(x))
    if isinstance(x, decimal.Decimal):
        return ("d", str(x))  # scale-sensitive: 947.0000 != 947.00
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


def type_class(t):
    """Collapse an arrow type to the class the driver's schema check
    distinguishes: ints, floats, decimal(scale), bool, string, ts, date,
    binary, list<inner>."""
    import pyarrow as pa
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{f.name}:{type_class(f.type)}" for f in t) + ">"
    return str(t)


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
        sp_t = pq.read_table(files[0])
        sp = sp_t.to_pandas()
        try:
            # arrow fetch preserves DECIMAL and DATE (df() would collapse
            # them to float64 / datetime64)
            du_t = con.execute(oracle[k]).arrow()
            du = du_t.to_pandas()
        except Exception as e:
            print(f"[OERR]  {k}: {type(e).__name__}: {e}")
            fail += 1
            continue
        sp_types = {f.name: type_class(f.type) for f in sp_t.schema}
        du_types = {f.name: type_class(f.type) for f in du_t.schema}
        if sp_types != du_types:
            diff = {c: (sp_types.get(c), du_types.get(c))
                    for c in set(sp_types) | set(du_types)
                    if sp_types.get(c) != du_types.get(c)}
            print(f"[TYPE]  {k}: {diff}")
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
