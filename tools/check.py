#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output
against DuckDB oracles. Usage:
  python3 tools/check.py [--ulp] [sfdir] [verify_out] [only_prefix...]

Values are compared as DuckDB-RENDERED strings (the driver hashes
rendered values, so a DECIMAL "1511964.0000" vs a DOUBLE "1511964.0"
must fail here too — r10's q01 proved the old pandas float-equality
compare was weaker than the driver's gate). --ulp enables a 1-ulp
tolerance for DOUBLE/FLOAT columns ONLY — intended for the builder's
own sf0.1 sweep, where DuckDB's DECIMAL→DOUBLE double-rounding can
land one ulp off Spark's single correctly-rounded conversion. The
driver-mirroring sf0.01 run must NOT pass --ulp.

check_progress.py imports connect()/gate() from here so the
progressive variant can never drift to a weaker compare again.
"""
import duckdb, json, sys, os, math


def rendered(con, query, cols):
    """Fetch a result with every column rendered to VARCHAR by DuckDB
    itself — the same rendering the driver hashes."""
    sel = ", ".join(f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in cols)
    return con.execute(f"SELECT {sel} FROM ({query})").fetchdf()


def within_one_ulp(a, b):
    try:
        x, y = float(a), float(b)
    except (TypeError, ValueError):
        return False
    if math.isnan(x) and math.isnan(y):
        return True
    return abs(x - y) <= max(math.ulp(x), math.ulp(y))


def connect(sf):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def gate(con, out, oracle, name, ulp_tol):
    """Run the full driver-mirror gate for one query. Returns
    (status, n_rows) where status is "OK" / "FAIL" / "no_oracle";
    prints per-column diagnostics on mismatch."""
    try:
        s = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"{name}: SPARK-READ-FAIL {e}", flush=True)
        return "FAIL", 0
    if name not in oracle:
        return "no_oracle", len(s)
    try:
        o = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE-FAIL {e}", flush=True)
        return "FAIL", len(s)
    # Strict dtype gate (r8 verdict item 2): the driver hashes DuckDB's
    # *rendered* values, so a HUGEINT/DECIMAL/DOUBLE oracle column vs a
    # BIGINT Spark column fails its hash even when values are equal.
    # Compare DuckDB-side types of both results and fail on mismatch.
    try:
        st = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{out}/{name}/*.parquet'").fetchall()}
        ot = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE ({oracle[name]})").fetchall()}
        ok_types = True
        for c in sorted(set(st) | set(ot)):
            a, b = st.get(c), ot.get(c)
            if a != b:
                ok_types = False
                print(f"  {name}.{c} DTYPE mismatch: spark={a} oracle={b}",
                      flush=True)
    except Exception as e:
        ok_types = False
        st = {}
        print(f"  {name} dtype-describe error: {e}", flush=True)
    ok_rows = len(s) == len(o)
    ok_cols = sorted(s.columns) == sorted(o.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            # Rendered-string compare (r10 verdict item 2): both sides
            # rendered to VARCHAR by DuckDB, columns sorted by name —
            # exactly what the driver hashes.
            cols = sorted(s.columns)
            sr = rendered(con, f"SELECT * FROM '{out}/{name}/*.parquet'",
                          cols).reset_index(drop=True)
            orr = rendered(con, oracle[name], cols).reset_index(drop=True)
            ok_vals = True
            for c in cols:
                a = sr[c].fillna("\x00NULL")
                b = orr[c].fillna("\x00NULL")
                bad = a != b
                if bad.any() and ulp_tol and (
                        "DOUBLE" in (st.get(c) or "") or
                        "FLOAT" in (st.get(c) or "")):
                    bad = bad & ~a.combine(b, within_one_ulp)
                if bad.any():
                    ok_vals = False
                    idx = bad[bad].index[:3].tolist()
                    print(f"  {name}.{c} first rendered diffs at rows {idx}: "
                          f"spark={a.iloc[idx].tolist()} "
                          f"oracle={b.iloc[idx].tolist()}", flush=True)
        except Exception as e:
            ok_vals = False
            print(f"  {name} compare error: {e}", flush=True)
    if ok_rows and ok_cols and ok_vals and ok_types:
        return "OK", len(s)
    print(f"{name}: FAIL rows {len(s)}/{len(o)} cols_match={ok_cols} "
          f"types_match={ok_types} "
          f"spark_cols={list(s.columns)} oracle_cols={list(o.columns)}",
          flush=True)
    return "FAIL", len(s)


def main():
    argv = [a for a in sys.argv[1:] if a != "--ulp"]
    ulp_tol = "--ulp" in sys.argv[1:]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
    only = argv[2:]

    con = connect(sf)
    oracle = json.load(open(f"{out}/oracle_sql.json"))

    fails = 0
    for name in sorted(os.listdir(out)):
        if not os.path.isdir(f"{out}/{name}"):
            continue
        if only and not any(name.startswith(p) for p in only):
            continue
        status, n = gate(con, out, oracle, name, ulp_tol)
        if status == "OK":
            print(f"{name}: OK ({n} rows)", flush=True)
        elif status == "no_oracle":
            print(f"{name}: no_oracle rows={n}", flush=True)
        else:
            fails += 1
    print("FAILS:", fails, flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
