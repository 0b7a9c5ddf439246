#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables, compare sorted values.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import duckdb, glob, json, os, sys

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = sorted(got_rel.columns)
        got = con.sql(
            f"SELECT {', '.join(chr(34)+c+chr(34) for c in cols)} FROM '{d}/*.parquet'").fetchall()
        got = sorted(map(tuple, got))
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows "
                  + ("OK" if got else "EMPTY!"))
            if not got:
                n_fail += 1
            continue
        want_rel = con.sql(oracles[name])
        wcols = sorted(want_rel.columns)
        want = con.sql(
            f"SELECT {', '.join(chr(34)+c+chr(34) for c in wcols)} FROM ({oracles[name]})").fetchall()
        want = sorted(map(tuple, want))
        # dtype parity: the driver's hash is dtype-sensitive (round 1: DuckDB
        # HUGEINT promotion of sum()/sum() OVER () broke q04/q29/q37 while this
        # value-only compare passed). Normalize int widths (parquet INT32 vs
        # BIGINT both hash as int64 driver-side) but flag HUGEINT/DECIMAL drift.
        def norm(t):
            t = str(t).upper()
            return "BIGINT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        gt = {c: norm(t) for c, t in zip(got_rel.columns, got_rel.types)}
        wt = {c: norm(t) for c, t in zip(want_rel.columns, want_rel.types)}
        if cols != wcols:
            print(f"[FAIL-schema] {name}: spark={cols} oracle={wcols}")
            n_fail += 1
        elif any(gt[c] != wt[c] for c in cols):
            bad = {c: (gt[c], wt[c]) for c in cols if gt[c] != wt[c]}
            print(f"[FAIL-dtype] {name}: {bad}")
            n_fail += 1
        elif got != want:
            n_fail += 1
            diff_a = [r for r in got if r not in set(want)][:3]
            diff_b = [r for r in want if r not in set(got)][:3]
            print(f"[FAIL-data] {name}: {len(got)} vs {len(want)} rows; "
                  f"spark-only={diff_a} oracle-only={diff_b}")
        else:
            n_pass += 1
            print(f"[PASS] {name}: {len(got)} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
