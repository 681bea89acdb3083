#!/usr/bin/env python3
"""Lint oracle SQL result types against the driver's hash canonicalization.

DuckDB widens integer aggregates (plain and windowed SUM over
INTEGER/BIGINT, SUM in a CTE reused downstream, ...) to HUGEINT (INT128).
Spark has no 128-bit integer type, and the driver's newer-DuckDB
canonicalization renders HUGEINT differently from BIGINT, so any oracle
column that SURFACES as HUGEINT breaks the driver's value hash even when
every value is numerically identical (round-8 offenders: q_rate_anomalies,
q_stream_anomalies, q_text_entropy — all `rows_match:true,
hash_match:false`). The fix is always `CAST(... AS BIGINT)` in the final
SELECT; this lint makes the drift class unshippable.

For each oracle it runs `DESCRIBE <sql>` over views of the real sf tables
(no data is scanned) and fails on HUGEINT/UHUGEINT result columns.

Usage: lint_oracle_types.py <sfDir> <oracle_sql.json>
Exit 0 = clean, 1 = offending columns found, 2 = setup/SQL error.
"""
import sys, os, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "UHUGEINT")


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_json) as f:
        oracles = json.load(f)

    offenders = {}
    errors = {}
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            errors[name] = str(e)[:300]
            continue
        bad = [(c, ty) for c, ty, *_ in desc
               if any(b in ty.upper() for b in BANNED)]
        if bad:
            offenders[name] = bad

    for name, cols in offenders.items():
        for c, ty in cols:
            print(f"OFFENDER {name}: column '{c}' is {ty} "
                  f"(CAST it to BIGINT in the final SELECT)")
    for name, err in errors.items():
        print(f"SQL_ERROR {name}: {err}")
    print(f"== {len(oracles)} oracles, {len(offenders)} with banned types, "
          f"{len(errors)} describe errors ==")
    if errors:
        return 2
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
