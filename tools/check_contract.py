"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir, compare row count, column names, and order-insensitive
values (EXACT equality, incl. floats — the compare was deliberately
zero-tolerance'd; the driver's own hash compare is just as strict).

Usage: python tools/check_contract.py [sf_dir] [query ...]
       [--json artifact.json]   # per-query verdict artifact (auditable
                                # sweep record, VERDICT r4 item 1c)
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_args = sys.argv[1:]
JSON_OUT = None
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2:]
SF = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def close(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=0.0, abs_tol=0.0)
    return a == b


def main():
    import __spark_entry__ as ent
    from emf_spark.session import get_spark

    spark = get_spark("contract_check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, sqls = ent.queries(), ent.oracle_sql()
    failures = []
    record: dict[str, dict] = {}
    ran, skipped = 0, 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        ran += 1
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            record[name] = {"status": "fail", "err": f"spark error: {e}"}
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in sqls:
            skipped += 1
            record[name] = {"status": "rows_only", "rows": len(sdf)}
            print(f"SKIP-ORACLE {name}: rows={len(sdf)}")
            continue
        try:
            ddf = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            record[name] = {"status": "fail", "err": f"duckdb error: {e}"}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append((name, f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}"))
            record[name] = {"status": "fail", "err": "column mismatch"}
            print(f"FAIL {name}: column mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            continue
        if len(sdf) != len(ddf):
            failures.append((name, f"rows {len(sdf)} vs {len(ddf)}"))
            record[name] = {"status": "fail",
                            "err": f"row count {len(sdf)} vs {len(ddf)}"}
            print(f"FAIL {name}: row count {len(sdf)} vs {len(ddf)}")
            continue
        cols = sorted(sdf.columns)
        srows = sorted(
            [tuple(norm(v) for v in row) for row in sdf[cols].itertuples(index=False)],
            key=lambda r: tuple(str(x) for x in r),
        )
        drows = sorted(
            [tuple(norm(v) for v in row) for row in ddf[cols].itertuples(index=False)],
            key=lambda r: tuple(str(x) for x in r),
        )
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(close(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            failures.append((name, f"value mismatch at sorted row {bad[0]}: {bad[1]} vs {bad[2]}"))
            record[name] = {"status": "fail", "err": failures[-1][1][:300]}
            print(f"FAIL {name}: {failures[-1][1]}")
        else:
            record[name] = {"status": "ok", "rows": len(sdf)}
            print(f"OK   {name}: rows={len(sdf)}")
    # tally only what actually RAN: the old "N/N" line counted
    # filtered-out and oracle-less queries as matches (review finding)
    compared = ran - skipped
    extra = f" ({skipped} rows-only, no oracle)" if skipped else ""
    sel = "" if not ONLY else f" of {len(qs)} registered"
    print(f"\n{compared - len(failures)}/{compared} compared queries match{sel}{extra}")
    if JSON_OUT:
        import json

        Path(JSON_OUT).write_text(json.dumps({
            "sf_dir": SF,
            "n_queries": ran,
            "n_ok": compared - len(failures),
            "n_fail": len(failures),
            "n_rows_only": skipped,
            "queries": record,
        }, indent=1))
        print(f"wrote {JSON_OUT}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
