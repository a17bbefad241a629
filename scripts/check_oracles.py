"""Driver-style correctness harness: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet, compare row
count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from searchlite_spark import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, colnames):
    out = []
    for r in rows:
        vals = []
        for c in sorted(colnames):
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", cores=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    con = duckdb.connect()
    # DuckDB's default memory_limit is 80% of the BOX — sharing the
    # process with a 48g Spark driver JVM, that OOM-killed the sf1
    # gate (114 GB python RSS).  Cap it so heavy oracles spill to disk
    # instead; override via DUCKDB_MEM for bigger hosts.
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '16GB')}'"
    )
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset: glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = [dict(zip(ocols, r)) for r in ores.fetchall()]
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        sset = normalize([r.asDict() for r in srows], scols)
        oset = normalize(orows, ocols)
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema mismatch {scols} vs {ocols}"))
            print(f"FAIL {name}: schema {scols} vs {ocols}")
        elif len(sset) != len(oset):
            failures.append((name, f"rowcount {len(sset)} vs {len(oset)}"))
            print(f"FAIL {name}: rowcount {len(sset)} vs {len(oset)}")
            print("  spark:", sset[:3])
            print("  oracle:", oset[:3])
        elif sset != oset:
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            failures.append((name, f"value mismatch {diff}"))
            print(f"FAIL {name}: values differ, e.g. {diff}")
        else:
            print(f"OK   {name}: {len(sset)} rows")
    print(f"\n{len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
