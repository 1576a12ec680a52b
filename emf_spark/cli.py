"""spark-submit entry point (north rule: "run via spark-submit
--py-files on a multi-executor cluster").

Cluster:
    zip -r emf_spark.zip emf_spark
    spark-submit --py-files emf_spark.zip emf_spark/cli.py \
        --input s3://.../emf_tokenized --out s3://.../emf_out \
        --window-ms 60000 [--key-by-namespace] [--resumable]

Local:
    python -m emf_spark.cli --input ... --out ... [--cpus 32]

When launched by spark-submit the active SparkSession's master/resources
are used as-is; --cpus only applies when the script has to create its
own local session.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="EMF parse->enrich->route->aggregate")
    ap.add_argument("--input", required=True, help="tokenized table path/dir")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--window-ms", type=int, default=60_000)
    ap.add_argument("--key-by-namespace", action="store_true")
    ap.add_argument("--no-routed", action="store_true")
    ap.add_argument("--resumable", action="store_true",
                    help="resume event writes from the lineage manifest")
    ap.add_argument("--staging", choices=["parquet", "persist"], default="parquet",
                    help="parsed-intermediate materialization: parquet "
                         "checkpoint (resumable) or persist (run-once)")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local-mode cores (ignored under spark-submit)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from emf_spark.session import get_spark

        spark = get_spark("emf_spark_cli", cpus=args.cpus)

    from emf_spark import pipeline
    from emf_spark.operators import lineage

    if args.resumable:
        res = pipeline.run(
            spark,
            args.input,
            args.out,
            window_ms=args.window_ms,
            key_by_namespace=args.key_by_namespace,
            write_routed=not args.no_routed,
            staging=args.staging,
        )
        # re-route the event write through the manifest for idempotence
        info = lineage.write_events_resumable(spark, res.events, args.out)
        print(json.dumps({"resumable": info["written_rows"], "run_id": info["run_id"]}))
    else:
        res = pipeline.run(
            spark,
            args.input,
            args.out,
            window_ms=args.window_ms,
            key_by_namespace=args.key_by_namespace,
            write_routed=not args.no_routed,
            staging=args.staging,
        )
    stats = [r.asDict() for r in res.stats.collect()]
    print(json.dumps({"out": args.out, "stats": stats}, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
