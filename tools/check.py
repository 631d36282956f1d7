#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: load each query's
parquet output from Verify.scala, run the matching oracle SQL in DuckDB
over the same test tables, compare row counts / schemas / sorted values.
Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"): return v.isoformat()
    from decimal import Decimal
    if isinstance(v, Decimal):
        # NEVER float-coerce: the driver hashes typed values, so a
        # decimal128 oracle column vs an int64 spark column must FAIL
        # here too (r4 tp_pack_tokens shipped red because this coerced).
        return v if v != v.to_integral_value() else ("decimal", int(v))
    return v

def type_family(t):
    """Coarse arrow-type family: the driver hashes typed values, so a
    decimal-vs-integer mismatch fails its gate even when values agree.
    Widths within a family (int32/int64, float32/float64) are tolerated."""
    import pyarrow.types as pt
    if pt.is_decimal(t): return "decimal"
    if pt.is_integer(t): return "int"
    if pt.is_floating(t): return "float"
    if pt.is_boolean(t): return "bool"
    if pt.is_string(t) or pt.is_large_string(t): return "string"
    if pt.is_binary(t) or pt.is_large_binary(t): return "binary"
    if pt.is_timestamp(t): return "timestamp"
    if pt.is_date(t): return "date"
    if pt.is_list(t) or pt.is_large_list(t): return f"list<{type_family(t.value_type)}>"
    return str(t)

def rows_of(table):
    cols = sorted(table.column_names)
    fams = [type_family(table.schema.field(c).type) for c in cols]
    data = [table.column(c).to_pylist() for c in cols]
    return cols, fams, sorted((tuple(canon(v) for v in row) for row in zip(*data)), key=repr)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path): continue
        if only and name not in only: continue
        files = glob.glob(f"{path}/*.parquet")
        got = pq.read_table(files[0]) if files else None
        if name not in oracles:
            print(f"[rows-only] {name}: rows={got.num_rows if got else 'MISSING'}")
            continue
        try:
            want = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}"); n_fail += 1; continue
        if got is None:
            print(f"[FAIL] {name}: spark output missing"); n_fail += 1; continue
        gc, gf, gr = rows_of(got)
        wc, wf, wr = rows_of(want)
        if gc != wc:
            print(f"[FAIL] {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if gf != wf:
            bad = [(c, a, b) for c, a, b in zip(gc, gf, wf) if a != b]
            print(f"[FAIL] {name}: type mismatch {bad} (driver hashes typed values)")
            n_fail += 1; continue
        if len(gr) != len(wr):
            print(f"[FAIL] {name}: rows {len(gr)} != {len(wr)}"); n_fail += 1; continue
        if gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"[FAIL] {name}: value mismatch at sorted row {bad}:")
            print(f"   spark: {gr[bad]}")
            print(f"   duck : {wr[bad]}")
            n_fail += 1; continue
        print(f"[ok] {name}: {len(gr)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
