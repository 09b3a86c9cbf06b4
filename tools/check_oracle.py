#!/usr/bin/env python
"""Local pre-flight for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (schema + values), so oracle
mismatches are caught before the round ends. Usage:
    python tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

# Arrow types that stringify identically under the driver's hash
# canonicalization; anything else (decimal128 vs int64, float64 vs int64,
# timestamp precision) hashes differently even when the values are equal.
_TYPE_EQUIV = {
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "string": "string", "large_string": "string",
}

def _type_key(arrow_type):
    s = str(arrow_type)
    return _TYPE_EQUIV.get(s, s)

def lint_types(con, name, out_dir, oracle_sql):
    """Compare Arrow result schemas (spark parquet dump vs DuckDB oracle).
    The value comparison below misses type-only drift (duckdb fetchall
    returns Python ints for HUGEINT), but the driver hashes at the Arrow
    layer where decimal128(38,0) != int64 — q87 round-3/4 regression."""
    g_schema = con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").arrow().schema
    e_schema = con.execute(
        f"SELECT * FROM ({oracle_sql}) LIMIT 0").arrow().schema
    g_types = {f.name: _type_key(f.type) for f in g_schema}
    e_types = {f.name: _type_key(f.type) for f in e_schema}
    bad = []
    for col in sorted(set(g_types) & set(e_types)):
        if g_types[col] != e_types[col]:
            bad.append(f"{col}: spark={g_types[col]} oracle={e_types[col]}")
    return bad

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols):
    """Sort columns by name, then rows; stringify values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("NaN")
                else: vals.append(repr(v))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}  # driver-shaped rows for tools/check_claims.py
    for name in sorted(oracle):
        report[name] = {"rows_match": False, "schema_match": False,
                        "hash_match": False, "err": None}
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            report[name]["err"] = "no spark output"
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols = [d[0] for d in got.description]; g_rows = got.fetchall()
            exp = con.execute(oracle[name])
            e_cols = [d[0] for d in exp.description]; e_rows = exp.fetchall()
        except Exception as e:
            report[name]["err"] = str(e)
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if sorted(g_cols) != sorted(e_cols):
            print(f"FAIL {name}: cols spark={sorted(g_cols)} oracle={sorted(e_cols)}")
            n_bad += 1; continue
        try:
            type_diffs = lint_types(con, name, out_dir, oracle[name])
        except Exception as e:
            type_diffs = [f"type-lint error: {e}"]
        if type_diffs:
            print(f"FAIL {name}: schema types differ (driver hash will mismatch): "
                  + "; ".join(type_diffs))
            n_bad += 1; continue
        gc, g = canon(g_rows, g_cols)
        ec, e = canon(e_rows, e_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}"); n_bad += 1; continue
        diffs = [(a, b) for a, b in zip(g, e) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(g)} rows differ; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_bad += 1
        else:
            report[name].update(rows_match=True, schema_match=True, hash_match=True)
            print(f"ok   {name} ({len(g)} rows)"); n_ok += 1
    with open(f"{out_dir}/correctness_local.json", "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
