#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, reads the Spark-written parquet and
runs the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables; compares row counts, sorted-by-name column sets, and cell values
(exact for non-floats, tiny-epsilon report for floats so we can see HOW
close we are before tightening to bit-exact).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(sf_dir, out_dir):
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
            exp = con.sql(sql).fetchall()
            exp_cols = [d[0] for d in con.sql(sql).description]
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
                         zip(exp_cols, con.sql(sql).types)}
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
    sys.exit(main(sys.argv[1], sys.argv[2]))
