#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's dumped
parquet results against the oracle SQL in oracle_sql.json via DuckDB and
compare values with columns sorted by name (the driver's compare rule).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no result parquet")
        n_fail += 1
        continue
    try:
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        want_rel = con.sql(sql)
        got, want = got_rel.df(), want_rel.df()
        got_types = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
        want_types = dict(zip(want_rel.columns, [str(t) for t in want_rel.types]))
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        n_fail += 1
        continue
    # Type lint: the driver's hasher is TYPED, so a DuckDB HUGEINT/DECIMAL
    # column vs a Spark BIGINT/DOUBLE hash-mismatches even when every value
    # is equal (pandas coerces, hiding it from the value compare below).
    # Fail loudly here so the oracle gets an explicit CAST instead.
    type_drift = []
    for c in got.columns:
        gt, wt = got_types.get(c, "?"), want_types.get(c, "?")
        if gt != wt:
            benign = {("BIGINT", "INTEGER"), ("INTEGER", "BIGINT"),
                      ("DOUBLE", "FLOAT"), ("FLOAT", "DOUBLE")}
            if (gt, wt) not in benign:
                type_drift.append(f"{c}: spark={gt} oracle={wt}")
    if type_drift:
        print(f"FAIL {name}: ORACLE TYPE DRIFT (add CAST in oracle SQL): "
              + "; ".join(type_drift))
        n_fail += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        n_fail += 1
        continue
    # Compare row-by-row in result order (strictest interpretation).
    mismatch = None
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        if a != b:
            mismatch = (c, next((i, x, y) for i, (x, y) in
                                enumerate(zip(a, b)) if x != y))
            break
    if mismatch:
        c, (i, x, y) = mismatch
        print(f"FAIL {name}: col {c} row {i}: got {x!r} want {y!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
print(f"\n{n_pass} pass / {n_fail} fail")

# Bench-artifact schema lint (round-13 fold): the artifact carries ONE
# stats map — entry_stats, with wall/cpu/gc/bytes_read/records_read per
# entry — and the `entries` count must equal its coverage so a partial
# or drifted artifact fails loudly instead of reading as "covered".
bench_path = sys.argv[3] if len(sys.argv) > 3 else \
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench_last.json")
if os.path.exists(bench_path):
    b = json.load(open(bench_path))
    stats = b.get("entry_stats", {})
    required = {"wall", "cpu", "gc", "bytes_read", "records_read"}
    problems = []
    if "queries" in b:
        problems.append("legacy top-level 'queries' map present "
                        "(pre-fold schema)")
    if b.get("entries") != len(stats):
        problems.append(f"entries={b.get('entries')} != "
                        f"len(entry_stats)={len(stats)}")
    for k, v in stats.items():
        missing = required - set(v)
        if missing:
            problems.append(f"{k}: missing stats {sorted(missing)}")
            break
    if problems:
        print(f"BENCH LINT FAIL ({bench_path}): " + "; ".join(problems))
        n_fail += 1
    else:
        print(f"BENCH LINT PASS ({bench_path}: {len(stats)} entries, "
              "one stats map)")

sys.exit(1 if n_fail else 0)
