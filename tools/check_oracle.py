#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [timeoutSec]
       python3 tools/check_oracle.py --preflight <sfDir> <oracleSqlJson> [timeoutSec]

For each query dir under verifyOutDir, reads the Spark-written parquet and
runs the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables; compares row counts, sorted-by-name column sets, and cell values
(exact for non-floats, tiny-epsilon report for floats so we can see HOW
close we are before tightening to bit-exact).

EVERY oracle execution runs under a per-query timeout (default 60 s): a
single infeasible-in-DuckDB oracle (the round-8 q226 incident — inlined
peel CTEs re-expanded the shingle pipeline ~3^6 times and never finished)
must fail ONE query loudly, never wedge the whole gate into an empty
CORRECTNESS artifact. --preflight skips the Spark-output comparison and
just executes each oracle SQL with the timeout, printing per-query wall
time — run it over BOTH sf0.01 and sf0.1 before every round close.
"""
import json
import math
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


class OracleTimeout(Exception):
    pass


def timed_fetch(con, sql, timeout_sec):
    """Execute sql once, returning (rows, cols, types); interrupt the
    engine and raise OracleTimeout if it exceeds timeout_sec."""
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_sec):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.time()
    try:
        rel = con.sql(sql)
        rows = rel.fetchall()
        cols = [d[0] for d in rel.description]
        types = rel.types
    except duckdb.InterruptException:
        raise OracleTimeout(
            f"oracle exceeded {timeout_sec}s (interrupted at "
            f"{time.time() - t0:.1f}s)")
    finally:
        done.set()
    return rows, cols, types


def preflight(sf_dir, oracle_json, timeout_sec):
    """Run every oracle SQL (no Spark side) under the timeout; print the
    per-query wall time so slow-but-feasible oracles are visible before
    they become infeasible at the next scale factor."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            rows, _, _ = timed_fetch(con, sql, timeout_sec)
            print(f"ok   {name}: {len(rows)} rows in {time.time() - t0:.2f}s")
            ok += 1
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fail += 1
    print(f"== preflight {sf_dir}: {ok} ok, {fail} fail "
          f"(timeout {timeout_sec}s/query)")
    return 1 if fail else 0


def main(sf_dir, out_dir, timeout_sec=60.0):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    skipped = []
    for name, sql in sorted(oracle.items()):
        try:
            import os
            if not os.path.isdir(f"{out_dir}/{name}"):
                # query not part of this (filtered) Verify run — count and
                # report so a CRASHED query in a FULL run can't silently
                # read as "0 fail" (the skip total is printed at the end)
                skipped.append(name)
                continue
            exp, exp_cols, exp_types_l = timed_fetch(con, sql, timeout_sec)
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = got_rel.fetchall()
            got_cols = [d[0] for d in got_rel.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            fail += 1
            continue
        status = []
        if sorted(exp_cols) != sorted(got_cols):
            status.append(f"cols exp={sorted(exp_cols)} got={sorted(got_cols)}")
        else:
            # Driver hash is TYPE-sensitive: DuckDB HUGEINT (SUM over ints)
            # vs Spark BIGINT hash differently even when values match.
            exp_types = {c: str(t) for c, t in
                         zip(exp_cols, exp_types_l)}
            got_types = {c: str(t) for c, t in
                         zip(got_cols, got_rel.types)}
            for c in exp_cols:
                if exp_types[c] != got_types[c]:
                    msg = f"type col={c} oracle={exp_types[c]} spark={got_types[c]}"
                    if "HUGEINT" in exp_types[c] or "HUGEINT" in got_types[c]:
                        status.append(msg)  # known driver-hash breaker
                    else:
                        print(f"warn {name}: {msg}")
        if len(exp) != len(got):
            status.append(f"rows exp={len(exp)} got={len(got)}")
        if not status:
            # reorder got columns to expected order by name
            perm = [got_cols.index(c) for c in exp_cols]
            worst = 0.0
            mismatch = None
            for i, (er, gr0) in enumerate(zip(exp, got)):
                gr = [gr0[p] for p in perm]
                for j, (a, b) in enumerate(zip(er, gr)):
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        d = abs(a - b)
                        if d > worst:
                            worst = d
                        if a != b and mismatch is None:
                            mismatch = (i, exp_cols[j], a, b)
                    elif a != b:
                        mismatch = (i, exp_cols[j], a, b)
                        status.append(f"cell row{i} col={exp_cols[j]} exp={a!r} got={b!r}")
                        break
                if status:
                    break
            if not status and worst > 0:
                status.append(f"float drift max={worst!r} first={mismatch}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            fail += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            ok += 1
    tail = f", {len(skipped)} skipped (no output dir: {', '.join(skipped[:5])}{'...' if len(skipped) > 5 else ''})" if skipped else ""
    print(f"== {ok} ok, {fail} fail{tail}")
    return 1 if fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "--preflight":
        sys.exit(preflight(sys.argv[2], sys.argv[3],
                           float(sys.argv[4]) if len(sys.argv) > 4 else 60.0))
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 60.0))
