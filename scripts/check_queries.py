"""Targeted oracle check: like drive_contract.py but only for the query
names given on the command line (fast iteration while adding operators).

Usage: python scripts/check_queries.py name1 name2 ...
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from scripts.drive_contract import SF, TABLES, value_hash


def main(names):
    from bigdata_group4_app_spark.registry import ORACLE_REGISTRY, QUERY_REGISTRY

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
    n_ok = 0
    for name in names:
        sdf = QUERY_REGISTRY[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in ORACLE_REGISTRY:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            n_ok += 1
            continue
        otbl = con.execute(ORACLE_REGISTRY[name]).arrow()
        orows = [tuple(r.values()) for r in otbl.to_pylist()]
        ocols = otbl.schema.names
        sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and sh == oh
        )
        n_ok += ok
        print(f"{'MATCH' if ok else 'MISMATCH'} {name}: "
              f"spark {len(srows)}x{len(scols)} {sh} | "
              f"oracle {len(orows)}x{len(ocols)} {oh}")
        if not ok:
            print("   spark cols:", scols)
            print("   oracle cols:", ocols)
            for a, b in list(zip(sorted(srows), sorted(orows)))[:5]:
                print("   s:", a, "\n   o:", b)
        bad = [
            (f.name, str(f.type))
            for f in otbl.schema
            if str(f.type)
            not in {
                "int8", "int16", "int32", "int64", "float", "double",
                "bool", "string", "large_string", "date32[day]",
            }
            and not str(f.type).startswith("timestamp")
            and not str(f.type).startswith("list")
        ]
        if bad:
            print(f"TYPE-HAZARD {name}: {bad}")
    print(f"{n_ok}/{len(names)} ok")
    spark.stop()
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
