"""Replicate the driver's pandas-hash compare for named queries.

Usage: python tools/verify_hash.py <query> [<query> ...]
       python tools/verify_hash.py --all
Exact surface the external driver checks: row count, schema (column
names), and a pandas-rendered column-name-sorted value hash at sf0.01.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def pandas_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(tuple(str(v) for v in row) for row in pdf.itertuples(index=False))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    import __spark_entry__ as ent
    from emf_spark.session import get_spark

    names = sys.argv[1:]
    q = ent.queries()
    o = ent.oracle_sql()
    if names == ["--all"]:
        names = list(q)
    spark = get_spark("verify", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        spdf = q[name](spark, SF).toPandas()
        opdf = con.sql(o[name]).df()
        ok = (
            len(spdf) == len(opdf)
            and sorted(spdf.columns) == sorted(opdf.columns)
            and pandas_hash(spdf) == pandas_hash(opdf)
        )
        print(f"{name}: {'OK' if ok else 'FAIL'} "
              f"({len(spdf)} vs {len(opdf)} rows)")
        if not ok:
            bad += 1
            if sorted(spdf.columns) != sorted(opdf.columns):
                print("  cols:", sorted(spdf.columns), "vs", sorted(opdf.columns))
            print("  dtypes spark:", dict(spdf.dtypes.astype(str)))
            print("  dtypes oracle:", dict(opdf.dtypes.astype(str)))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
