#!/usr/bin/env python3
"""Local emulation of the driver's correctness compare.

Runs `graft.Verify` output (parquet per query) against the DuckDB oracle
SQL (oracle_sql.json) on the same sf dir, sorting columns by name and
rows canonically, then value-compares. Dev tool only — not part of the
Scala library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        def run(sql_text):
            # one execution: rows AND arrow types both come from the
            # same fetched table (fetchall after fetch_arrow_table would
            # need a second, full re-execution of the query)
            cur = con.execute(sql_text)
            cols = [d[0] for d in cur.description]
            tbl = cur.fetch_arrow_table()
            types = [str(t) for t in tbl.schema.types]
            rows = list(zip(*[c.to_pylist() for c in tbl.columns])) \
                if tbl.num_columns else []
            return cols, types, rows
        try:
            gcols, gtypes, grows = run(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            ecols, etypes, erows = run(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        # The driver hash-compares TYPED values — a BIGINT/HUGEINT mismatch
        # fails there even when stringified values agree, so compare arrow
        # types (sorted by column name) too.
        gt = [t for _, t in sorted(zip(gcols, gtypes))]
        et = [t for _, t in sorted(zip(ecols, etypes))]
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
        elif gt != et:
            print(f"FAIL {name}: arrow types differ spark={list(zip(gc, gt))} "
                  f"oracle={list(zip(ec, et))}")
            n_fail += 1
        elif gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; "
                  f"first diffs: {diffs[:3]}"
                  + (f" extra_spark={gr[len(er):][:2]}" if len(gr) > len(er) else "")
                  + (f" extra_oracle={er[len(gr):][:2]}" if len(er) > len(gr) else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
