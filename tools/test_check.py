#!/usr/bin/env python3
"""Self-test for the driver-mirror gate in tools/check.py.

Pins the three behaviors the r10→r11 hardening claims, as executable
red/green cases instead of a one-off manual probe:

1. rendered-string compare: a DOUBLE Spark column vs a DECIMAL(38,4)
   oracle column FAILS even though the values are float-equal (the
   r10 q01 regression class — the driver hashes rendered values).
2. matching types and renderings pass.
3. --ulp: a DOUBLE value one ulp off the oracle's FAILS strict and
   PASSES with ulp tolerance (the sf0.1 DECIMAL→DOUBLE double-round);
   a two-ulp error fails BOTH ways.

Run: python3 tools/test_check.py   (exit 0 = all cases behave)
"""
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb  # noqa: E402
from check import connect, gate  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_fixture(root):
    """A fake sf dir (one-row stand-ins so connect() resolves) and a
    fake Verify out dir."""
    sf = os.path.join(root, "sf")
    out = os.path.join(root, "out")
    os.makedirs(sf)
    os.makedirs(out)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT 1 AS k) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
    return sf, out, con


def dump(con, out, name, select_sql):
    os.makedirs(f"{out}/{name}", exist_ok=True)
    con.execute(f"COPY ({select_sql}) TO '{out}/{name}/part-0.parquet' "
                "(FORMAT PARQUET)")


def main():
    root = tempfile.mkdtemp(prefix="check_selftest_")
    try:
        sf, out, con = make_fixture(root)
        one_ulp_off = 1511964.0 + math.ulp(1511964.0)
        two_ulp_off = 1511964.0 + 2 * math.ulp(1511964.0)
        dump(con, out, "t1_decimal_vs_double",
             "SELECT CAST(1511964.0 AS DOUBLE) AS x")
        dump(con, out, "t2_exact", "SELECT CAST(1511964.0 AS DOUBLE) AS x")
        dump(con, out, "t3_one_ulp", f"SELECT CAST({one_ulp_off!r} AS DOUBLE) AS x")
        dump(con, out, "t4_two_ulp", f"SELECT CAST({two_ulp_off!r} AS DOUBLE) AS x")
        oracle = {
            # float-equal but DECIMAL-rendered: must FAIL (r10 q01 class)
            "t1_decimal_vs_double":
                "SELECT CAST(1511964.0000 AS DECIMAL(38,4)) AS x",
            "t2_exact": "SELECT CAST(1511964.0 AS DOUBLE) AS x",
            "t3_one_ulp": "SELECT CAST(1511964.0 AS DOUBLE) AS x",
            "t4_two_ulp": "SELECT CAST(1511964.0 AS DOUBLE) AS x",
        }
        gcon = connect(sf)
        cases = [
            ("t1_decimal_vs_double", False, "FAIL"),
            ("t2_exact", False, "OK"),
            ("t3_one_ulp", False, "FAIL"),  # strict: 1 ulp is a red row
            ("t3_one_ulp", True, "OK"),     # --ulp absorbs exactly 1 ulp
            ("t4_two_ulp", True, "FAIL"),   # --ulp does NOT absorb 2
        ]
        bad = 0
        for name, ulp, want in cases:
            got, _ = gate(gcon, out, oracle, name, ulp)
            tag = "ok" if got == want else "WRONG"
            if got != want:
                bad += 1
            print(f"[{tag}] {name} ulp={ulp}: expected {want}, got {got}")
        print("SELFTEST", "PASS" if bad == 0 else f"FAIL ({bad} cases)")
        return 1 if bad else 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
