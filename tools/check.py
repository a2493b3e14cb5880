#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: load each Verify
parquet result, run the matching oracle SQL in DuckDB over the same
testdata tables, and compare schemas + sorted rowsets.

Usage: python3 tools/check.py [--driver] <sfDir> <verifyOutDir> [query ...]

Two comparison modes:
  default  — fetch BOTH sides through DuckDB and compare Python values
             (rounded doubles). Catches value divergence but is blind to
             REPRESENTATION divergence: DuckDB normalizes both sides to
             the same Python types before we ever see them.
  --driver — driver-faithful: read the Spark parquet via pyarrow→pandas
             and the oracle via duckdb .df() (pandas), then hash the
             (dtype-tagged, exact-repr) cells the way the driver's
             pandas row hasher does. This mode FAILS where the default
             passes when the two sides materialize the same value as
             different pandas representations — e.g. parquet
             decimal128→Decimal vs DuckDB DECIMAL→float64 (the r15
             q1_pricing_summary / s1_envelope_wide_types incident).
"""
import json
import os
import sys
import tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_memory_limit():
    """min(48GB, 60% of physical RAM), overridable via GRAFT_DUCK_MEM —
    a limit above physical memory defeats DuckDB's spill path (it won't
    spill until the limit, the OS OOM-killer fires first)."""
    env = os.environ.get("GRAFT_DUCK_MEM")
    if env:
        return env
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        return f"{min(48, max(1, int(total * 0.6 / 2**30)))}GB"
    except (ValueError, OSError):
        return "48GB"


def driver_cell(v):
    """Driver-faithful cell normalization. Calibrated so every r14/r15
    driver-GREEN row still passes (int widths unify — INTEGER vs BIGINT
    was never red; DATE arrives as datetime.date from pyarrow but
    Timestamp from duckdb.df() on green rows, so date-likes unify to an
    ISO instant) while the classes the driver CANNOT round-trip stay
    distinct: Decimal cells tag 'decimal', floats tag 'float' with the
    exact repr (no 9dp rounding) — so parquet decimal128 vs DuckDB
    DECIMAL→float64 fails here exactly as it fails at the driver."""
    import datetime
    import decimal
    if v is None:
        return ("null", "")
    try:
        if v != v:  # NaN/NaT of any width, incl. np.float32
            return ("null", "")
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool,)) or type(v).__name__ == "bool_":
        return ("bool", str(bool(v)))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, int) or type(v).__name__.startswith(("int", "uint")):
        return ("int", str(int(v)))
    if isinstance(v, float) or type(v).__name__.startswith("float"):
        return ("float", repr(float(v)))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("ts", v.isoformat() + "T00:00:00")
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return (type(v).__name__, repr(v))


def driver_hash_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(driver_cell(v)
                  for v in tup)
            for tup in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


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
    driver_mode = "--driver" in argv
    if driver_mode:
        argv.remove("--driver")
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
    con.execute(f"SET memory_limit='{duck_memory_limit()}'")
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
        if driver_mode:
            try:
                import pyarrow.parquet as pq
                gdf = pq.read_table(f"{out_dir}/{name}").to_pandas()
                edf = con.execute(sql).df()
            except Exception as e:
                print(f"FAIL {name}: exception {e}")
                rec["err"] = str(e)
                n_fail += 1
                continue
            rec["spark_rows"], rec["oracle_rows"] = len(gdf), len(edf)
            if sorted(gdf.columns) != sorted(edf.columns):
                print(f"FAIL {name}: columns {sorted(gdf.columns)} != {sorted(edf.columns)}")
                n_fail += 1
                continue
            rec["schema_match"] = True
            if len(gdf) != len(edf):
                print(f"FAIL {name}: rows {len(gdf)} != {len(edf)}")
                n_fail += 1
                continue
            rec["rows_match"] = True
            g, e = driver_hash_rows(gdf), driver_hash_rows(edf)
            if g != e:
                bad = [(a, b) for a, b in zip(g, e) if a != b][:2]
                print(f"FAIL {name}: driver-repr differs, first diffs: {bad}")
                n_fail += 1
                continue
            rec["hash_match"] = True
            print(f"PASS {name}: {len(g)} rows (driver-faithful)")
            n_pass += 1
            continue
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
