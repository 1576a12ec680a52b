"""Scale curve for the EXACT Jaccard-threshold ssjoin (VERDICT r5
item 4): wall time + pair counts for dedup.jaccard_threshold_pairs at
increasing doc counts, with a fitted log-log exponent — the evidence
that the rarest-first prefix filter keeps the candidate join far from
the all-pairs exponent 2.0 (containment_pairs' measured 0.80 protocol).

Corpus: same deterministic synthetic family as tools/dedup_curve.py —
60-word docs over a 30k vocab (near-dup probability ~0: the volume
floor) plus a planted near-dup family of 4 for every 50th base doc
(one word changed), so TRUE pairs grow O(n) and any superlinear blowup
is the algorithm, not the data.

Usage: python tools/jaccard_curve.py [sizes_csv]
       (default 5000,15000,50000,150000)
Writes BENCH/JACCARD_CURVE.json and prints it.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SIZES = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else
                          "5000,15000,50000,150000").split(",")]


def corpus(spark, n: int, n_words: int = 60):
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(F.col("doc_id") * F.lit(997) + i), F.lit(30000)
            ).cast("string"),
        ),
    )
    docs = base.select("doc_id", F.concat_ws(" ", words).alias("text"))
    # planted near-dup family: every 50th base doc gets 3 variants with
    # ONE word changed (57/60 shared 3-shingles -> Jaccard ~ 0.85)
    fam = (
        base.filter(F.col("doc_id") % 50 == 0)
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("v"),
        )
        .select(
            (F.lit(n) + F.col("doc_id") * 3 + F.col("v")).alias("doc_id"),
            F.col("doc_id").alias("_src"),
            "v",
        )
    )
    fam_words = F.transform(
        F.sequence(F.lit(1), F.lit(n_words)),
        lambda i: F.when(
            i == F.col("v"), F.concat(F.lit("x"), F.col("v").cast("string"))
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(F.col("_src") * F.lit(997) + i), F.lit(30000)
                ).cast("string"),
            )
        ),
    )
    fam_docs = fam.select("doc_id", F.concat_ws(" ", fam_words).alias("text"))
    return docs.unionByName(fam_docs)


def main():
    from emf_spark.datax import dedup as dd
    from emf_spark.session import get_spark

    spark = get_spark(
        "jaccard_curve",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in SIZES:
        df = corpus(spark, n)
        df = df.repartition(spark.sparkContext.defaultParallelism * 2)
        df.persist().count()
        # warm-up at the smallest size only (codegen/JIT is fixed cost)
        runs = 2 if n == SIZES[0] else 1
        for _ in range(runs):
            t0 = time.time()
            pairs = dd.jaccard_threshold_pairs(df, threshold=0.6)
            npairs = pairs.count()
            wall = time.time() - t0
        df.unpersist()
        docs = n + 3 * (n // 50 + (1 if n % 50 else 0))
        out[str(n)] = {
            "docs": docs,
            "seconds": round(wall, 2),
            "pairs": npairs,
            "docs_per_s": round(docs / wall, 1),
        }
        print(f"n={n}: {out[str(n)]}", flush=True)
    # fit log-log exponent over (docs, seconds)
    xs = [math.log(v["docs"]) for v in out.values()]
    ys = [math.log(v["seconds"]) for v in out.values()]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    result = {
        "tool": "tools/jaccard_curve.py",
        "threshold": 0.6,
        "sizes": out,
        "fitted_exponent_docs_vs_seconds": round(slope, 2),
        "all_pairs_exponent": 2.0,
    }
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "JACCARD_CURVE.json").write_text(
        json.dumps(result, indent=2)
    )
    print(json.dumps(result, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
