#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: load each Verify
parquet result, run the matching oracle SQL in DuckDB over the same
testdata tables, and compare schemas + sorted rowsets.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
import tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(round(v, 9))
            else:
                rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    # an in-memory connection has NO spill path: the unrolled k-means /
    # similarity oracles at sf1+ exceed RAM and die with "Out of Memory"
    # at a 16 KB allocation. A temp_directory lets those oracles spill;
    # the memory_limit keeps DuckDB from fighting a concurrently-running
    # Spark for the whole host.
    tmp = tempfile.mkdtemp(prefix="graft_duck_spill_")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET memory_limit='48GB'")
    con.execute("SET max_temp_directory_size='200GB'")
    for t in TABLES:
        # driver testdata ships one file per table; ScaleData's sf1+
        # tables are parquet DIRECTORIES — fall back to the glob form
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.IOException:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            exp_types = [d[1] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            rec["err"] = str(e)
            n_fail += 1
            continue
        rec["spark_rows"], rec["oracle_rows"] = len(got), len(exp)
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        rec["schema_match"] = True
        g = norm([[r[i] for i in gi] for r in got])
        e = norm([[r[i] for i in ei] for r in exp])
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        rec["rows_match"] = True
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {bad}")
            n_fail += 1
            continue
        rec["hash_match"] = True
        print(f"PASS {name}: {len(g)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
