#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracle SQL and compare rows/schema/values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The driver's hash is sensitive to the oracle's OUTPUT DTYPES, not just
# values (round-12 postmortem: DuckDB sum(BIGINT)->HUGEINT, ntile->BIGINT,
# and DECIMAL values beyond int64 all failed the driver hash while being
# value-exact).  So beyond value equality we require DESCRIBE-level dtype
# parity between the Spark result parquet and the oracle query, and lint
# the oracle for types that can never match a Spark output.
def dtypes(con, sql):
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}

def lint_oracle_types(types):
    """Oracle output types Spark cannot emit -> always a contract bug."""
    bad = []
    for c, t in types.items():
        if t in ("HUGEINT", "UHUGEINT"):
            bad.append(f"{c}:{t} (uncast sum()? Spark has no {t})")
        elif t.startswith("DECIMAL("):
            prec = int(t.split("(")[1].split(",")[0])
            if prec > 18:
                bad.append(f"{c}:{t} (precision>18: values may exceed "
                           "int64 and diverge in driver canonicalization)")
    return bad

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark result dir")
            bad += 1
            continue
        files = glob.glob(f"{res_dir}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        # driver sorts columns by name before hashing
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        g = norm([tuple(r[i] for i in gi) for r in got])
        w = norm([tuple(r[i] for i in wi) for r in want])
        gt = dtypes(con, f"SELECT * FROM read_parquet({files!r})")
        wt = dtypes(con, f"({oracle[name]})")
        lint = lint_oracle_types(wt)
        dt_diff = {c: (gt.get(c), wt.get(c))
                   for c in set(gt) | set(wt) if gt.get(c) != wt.get(c)}
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}")
            bad += 1
        elif lint:
            print(f"FAIL {name}: oracle dtype lint: {lint}")
            bad += 1
        elif dt_diff:
            print(f"FAIL {name}: dtype mismatch (spark, oracle): {dt_diff}")
            bad += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            bad += 1
        elif g != w:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            ok += 1
    print(f"== {ok} ok / {bad} fail ==")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
