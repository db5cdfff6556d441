#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results on the same testdata.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query...]

Values are compared via fetchall (like the driver's hash over cell
reprs), and additionally pandas dtypes are compared via fetchdf —
the driver fetches through pandas, where e.g. an uncast DuckDB
HUGEINT (any sum(BIGINT)) lands as float64 while Spark's int64 stays
int64: identical values, different reprs, hash mismatch. The dtype
check makes that class of oracle-typing drift fail locally. Dtypes
are compared by KIND (int family / float / bool / object / datetime),
mirroring the driver's actual sensitivity: int32 vs int64 cells repr
identically (the full gate has 17 such benign pairs), int64 vs
float64 does not ("5" vs "5.0").
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    # gate-count tripwire: Verify records registered/selected/produced and
    # the names of queries that threw before writing output. A checker that
    # only iterates produced dirs would silently omit those (round 9 masked
    # five red queries this way) — fail on them unconditionally, even when
    # the caller asked for a subset.
    missing_set = set()
    try:
        gate = json.load(open(f"{out_dir}/gate_status.json"))
        for name in gate.get("missing", []):
            if only and name not in only:
                continue
            missing_set.add(name)
            print(f"FAIL {name}: no verify output (threw before writing)")
            n_fail += 1
        if not only and gate["selected"] < gate["registered"]:
            print(f"NOTE verify ran a {gate['selected']}/{gate['registered']} subset; "
                  "the driver gate runs the full map")
    except FileNotFoundError:
        print("WARN no gate_status.json (old Verify output?) — "
              "missing-query tripwire inactive")
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in missing_set:
            continue
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp_df = con.execute(sql).fetchdf()
            kind = lambda t: {"u": "i"}.get(t.kind, t.kind)
            gd = {c: kind(t) for c, t in got_df.dtypes.items()}
            ed = {c: kind(t) for c, t in exp_df.dtypes.items()}
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            gc, gr = norm_rows(got_cols, got)
            ec, er = norm_rows(exp_cols, exp)
            dtype_diff = {c: (gd.get(c), ed.get(c))
                          for c in set(gd) | set(ed) if gd.get(c) != ed.get(c)}
            if gc != ec:
                print(f"FAIL {name}: columns {gc} != {ec}")
                n_fail += 1
            elif dtype_diff:
                print(f"FAIL {name}: dtype drift (spark, oracle) = {dtype_diff}")
                n_fail += 1
            elif gr != er:
                n_fail += 1
                diff = [(a, b) for a, b in zip(gr, er) if a != b]
                print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; "
                      f"first diffs: {diff[:3]}"
                      + (f" extra_got={gr[len(er):][:2]}" if len(gr) > len(er) else "")
                      + (f" extra_exp={er[len(gr):][:2]}" if len(er) > len(gr) else ""))
            else:
                n_ok += 1
                print(f"ok   {name} ({len(gr)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
