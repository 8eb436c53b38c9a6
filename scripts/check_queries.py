"""Check a subset of registry queries against their oracles — the
per-operator iteration loop (full sweep: drive_contract.py).

Usage: python scripts/check_queries.py name1 name2 ...
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import duckdb
from pyspark.sql import SparkSession

from drive_contract import (  # noqa: E402
    SF,
    TABLES,
    bad_arrow_types,
    value_hash,
)

import __spark_entry__ as entrymod  # noqa: E402


def main(names):
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-queries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fail = 0
    for name in names:
        if name not in qs:
            print(f"UNKNOWN {name}")
            fail += 1
            continue
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        otbl = con.execute(oracles[name]).arrow()
        orows = [tuple(r.values()) for r in otbl.to_pylist()]
        ocols = otbl.schema.names
        typebad = bad_arrow_types(otbl.schema)
        if typebad:
            print(f"TYPE-HAZARD {name}: oracle columns {typebad}")
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and sh == oh
            and not typebad
        )
        fail += not ok
        print(
            f"{'MATCH' if ok else 'MISMATCH'} {name}: spark "
            f"{len(srows)}x{len(scols)} hash={sh} | oracle "
            f"{len(orows)}x{len(ocols)} hash={oh}"
        )
        if not ok:
            print("   spark cols:", scols)
            print("   oracle cols:", ocols)
            for a, b in list(zip(sorted(srows), sorted(orows)))[:5]:
                print("   s:", a, "\n   o:", b)
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
