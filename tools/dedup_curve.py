"""Dedup scale curve (VERDICT r2 item 10, extended r4): wall time +
pair counts for minhash (default capped config) and simhash (capped
default) at 50k / 150k / 500k / 1M docs, plus the INCREMENTAL leg in
the same chart (VERDICT r3 stretch): per size, bootstrap a signature
store on ~90% of the corpus and ingest the remaining ~10% as a batch —
`ingest_s` is the cost a daily pipeline actually pays, and should stay
~flat-per-batch-doc while `minhash.seconds` grows with the corpus.

Corpus: fully synthetic, columnar, deterministic — 60-word docs over a
30k vocab (near-dup probability ~0: the volume floor), plus a planted
near-dup family of 4 for every 50th base doc (one word changed), so the
TRUE pair count grows O(n) and any superlinear blowup is the algorithm,
not the data.

Usage: python tools/dedup_curve.py [sizes_csv]
       (default 50000,150000,500000,1000000)
Writes BENCH/DEDUP_CURVE.json and prints it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



def corpus(spark, n: int, n_words: int = 60):
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id") * F.lit(997) + i), F.lit(30000)).cast(
                "string"
            ),
        ),
    )
    docs = base.select("doc_id", F.array_join(words, " ").alias("text"))
    fam = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("rep"),
            "text",
        )
        .select(
            (F.col("doc_id") + F.lit(n) * F.col("rep")).alias("doc_id"),
            # change exactly the first word per replica -> Jaccard ~0.9
            F.concat(
                F.lit("v"), F.col("rep").cast("string"), F.lit(" "),
                F.substring_index("text", " ", -(n_words - 1)),
            ).alias("text"),
        )
    )
    return docs.union(fam)


def main():
    from emf_spark.datax import dedup
    from emf_spark.session import get_spark

    spark = get_spark("dedup_curve", cpus=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    # argv parse lives HERE, not at module level: tools/ingest_bench.py
    # imports corpus() from this module and must not have its own argv
    # re-parsed as a sizes list (review finding)
    sizes = [
        int(x)
        for x in (
            sys.argv[1] if len(sys.argv) > 1 else "50000,150000,500000,1000000"
        ).split(",")
    ]
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    for n in sizes:
        df = corpus(spark, n)
        df.write.mode("overwrite").parquet(f"/tmp/dedup_curve_{n}.parquet")
        df = spark.read.parquet(f"/tmp/dedup_curve_{n}.parquet")
        total = df.count()
        row = {"docs": total}
        t0 = time.time()
        mp = dedup.minhash_near_duplicates(df).count()  # defaults: capped 200
        dt = time.time() - t0
        row["minhash"] = {
            "seconds": round(dt, 2), "pairs": mp, "docs_per_s": round(total / dt, 1)
        }
        t0 = time.time()
        sp = dedup.simhash_near_duplicates(df).count()  # new capped default
        dt = time.time() - t0
        row["simhash"] = {
            "seconds": round(dt, 2), "pairs": sp, "docs_per_s": round(total / dt, 1)
        }
        # incremental leg: store bootstrapped on ids < 90th percentile
        # cut, the top ~10% of ids ingested as "today's batch" (the
        # generator's family ids exceed n, so the batch holds whole
        # families too — cross-store pairs exist)
        cutoff = int(n * 0.9)
        base = df.filter(F.col("doc_id") < cutoff)
        batch = df.filter(F.col("doc_id") >= cutoff)
        tmp = tempfile.mkdtemp(prefix=f"dedup_curve_store_{n}_")
        store = str(Path(tmp) / "sigstore")
        try:
            t0 = time.time()
            dedup.write_signature_store(base, store)
            boot_s = time.time() - t0
            t0 = time.time()
            ip = dedup.minhash_incremental(batch, store).count()
            ing_s = time.time() - t0
            b_n = batch.count()
            row["incremental"] = {
                "batch_docs": b_n,
                "bootstrap_s": round(boot_s, 2),
                "ingest_s": round(ing_s, 2),
                "pairs": ip,
                "batch_docs_per_s": round(b_n / ing_s, 1),
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        out[str(n)] = row
        print(json.dumps({str(n): row}), flush=True)
        spark.catalog.clearCache()
    (Path(__file__).resolve().parent.parent / "BENCH/DEDUP_CURVE.json").write_text(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
