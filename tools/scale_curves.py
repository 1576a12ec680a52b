"""Scale curves for the round-4 heavy operators (VERDICT r4 item 3):
wall time vs input size for semantic_dedup, sorted-neighborhood pair
generation, PageRank, and triangle counting — the plans ARGUE scale;
one measured curve each proves the claimed growth shape on live data.

All corpora are fully synthetic, columnar, deterministic (hash-derived
— no RNG, replayable bit-for-bit).

* semantic_dedup: docs n with k = ~sqrt(n) clusters (the method's
  balanced sizing: Lloyd work n*k and within-cluster pair work n^2/k
  meet at n^1.5). The measured exponent should sit WELL below 2.0 —
  the all-pairs exponent the clustering exists to avoid.
* snm_pairs: rows n at fixed window — candidate pairs are (window-1)*n
  by construction, so wall should track ~n (exponent ~1).
* pagerank / triangles: edges m at 10x steps on a hash-random graph
  (constant avg degree 10) — per-iteration O(V+E) and oriented-wedge
  O(m^1.5) worst-case bounds; on this degree-bounded graph both should
  grow ~linearly in m.

Usage: python tools/scale_curves.py [--quick]
Writes BENCH/SCALE_CURVES.json and prints it.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _wall(build, runs: int = 2) -> float:
    """Time OPERATOR CONSTRUCTION + execution: several of these
    operators do bounded driver-side work at call time (global_index's
    stats collect, pagerank's per-iteration lineage checkpoints), so
    timing only the final write would miss real cost. Best of ``runs``
    (one-sided VM noise, same estimator as bench.py --scaling)."""
    walls = []
    for _ in range(runs):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    return round(min(walls), 2)


def embeddings(spark, n: int, dim: int = 8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * F.lit(1013) + i), F.lit(2001))
                - F.lit(1000)
            ).cast("double") / F.lit(1000.0),
        ).alias("embedding"),
    )


def people(spark, n: int):
    # orderable numeric key with planted neighbors: every 10th row gets
    # a twin at key distance ~0 so the window actually pairs something
    return spark.range(n).select(
        F.col("id"),
        (
            F.pmod(F.xxhash64(F.floor(F.col("id") / 10)), F.lit(10**9))
            + F.col("id") % 10
        ).cast("double").alias("key"),
    )


def graph(spark, m: int):
    nodes = max(m // 10, 10)  # constant average degree 10
    return spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(nodes)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))


def loglines(spark, n: int):
    """Three-format log mix with hash-derived variable fields —
    fixed template diversity, so template-mining wall should track
    ~n (the token stream is the only thing that grows)."""
    i = F.col("id")
    h = F.pmod(F.xxhash64(i), F.lit(100_000)).cast("string")
    return spark.range(n).select(
        F.when(
            i % 3 == 0,
            F.concat(F.lit("INFO user u"), h, F.lit(" viewed page /p/"),
                     (i % 997).cast("string"), F.lit(" in "),
                     (i % 345).cast("string"), F.lit(" ms")),
        ).when(
            i % 3 == 1,
            F.concat(F.lit("INFO user u"), h, F.lit(" purchased sku-"),
                     (i % 89).cast("string"), F.lit(" qty "),
                     (i % 7).cast("string")),
        ).otherwise(
            F.concat(F.lit("WARN handler-"), (i % 5).cast("string"),
                     F.lit(" slow shard "), (i % 16).cast("string"))
        ).alias("line")
    )


def contdocs(spark, n: int, length: int = 30, vocab: int = 5000):
    """Docs of ``length`` hash-derived words; every 5th doc is a
    10-word EXCERPT of its group's base doc (containment 1.0, tiny
    Jaccard) — candidates stay within planted groups + rare 3-shingle
    hash collisions, so ssjoin wall should grow ~linearly, far from
    the all-ordered-pairs exponent 2."""
    i = F.col("id")
    base = F.when(i % 5 == 4, i - 4).otherwise(i)
    ln = F.when(i % 5 == 4, F.lit(10)).otherwise(F.lit(length))
    words = F.transform(
        F.sequence(F.lit(1), ln),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(base * 131 + j), F.lit(vocab)).cast("string"),
        ),
    )
    return spark.range(n).select(
        i.alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def exponent(sizes: list[int], walls: list[float]) -> float:
    """log-log slope between the first and last measured point."""
    return round(
        math.log(walls[-1] / walls[0]) / math.log(sizes[-1] / sizes[0]), 2
    )


def main():
    from emf_spark.datax.entity import sorted_neighborhood_pairs
    from emf_spark.datax.graph import pagerank_exact, triangle_count
    from emf_spark.datax.similarity import semantic_dedup
    from emf_spark.session import get_spark

    quick = "--quick" in sys.argv
    spark = get_spark("scale_curves", cpus=32)
    out: dict = {}

    # JVM/codegen warm-up on tiny inputs: excluded from every curve
    semantic_dedup(
        embeddings(spark, 2000), k=20, iters=1, threshold=0.9
    ).write.format("noop").mode("overwrite").save()
    sorted_neighborhood_pairs(
        people(spark, 5000), "key", window=3
    ).write.format("noop").mode("overwrite").save()
    _e = graph(spark, 5000).localCheckpoint(eager=True)
    pagerank_exact(_e, iters=3).write.format("noop").mode("overwrite").save()
    triangle_count(_e).write.format("noop").mode("overwrite").save()

    sem_sizes = [10_000, 40_000] if quick else [10_000, 40_000, 160_000]
    sem = []
    for n in sem_sizes:
        k = int(math.sqrt(n))
        df = embeddings(spark, n).localCheckpoint(eager=True)  # exclude gen
        w = _wall(lambda: semantic_dedup(df, k=k, iters=1, threshold=0.9))
        sem.append({"docs": n, "k": k, "seconds": w,
                    "docs_per_s": round(n / w, 1)})
    out["semantic_dedup"] = {
        "points": sem,
        "exponent": exponent(sem_sizes, [p["seconds"] for p in sem]),
        "allpairs_exponent_for_reference": 2.0,
    }

    snm_sizes = [100_000, 400_000] if quick else [100_000, 400_000, 1_600_000]
    snm = []
    for n in snm_sizes:
        df = people(spark, n).localCheckpoint(eager=True)
        w = _wall(lambda: sorted_neighborhood_pairs(df, "key", window=3))
        snm.append({"rows": n, "seconds": w, "rows_per_s": round(n / w, 1)})
    out["snm_pairs"] = {
        "points": snm,
        "exponent": exponent(snm_sizes, [p["seconds"] for p in snm]),
    }

    g_sizes = [100_000, 1_000_000]
    pr, tr = [], []
    for m in g_sizes:
        e = graph(spark, m).localCheckpoint(eager=True)
        wp = _wall(lambda: pagerank_exact(e, iters=3))
        wt = _wall(lambda: triangle_count(e))
        pr.append({"edges": m, "seconds": wp, "edges_per_s": round(m / wp, 1)})
        tr.append({"edges": m, "seconds": wt, "edges_per_s": round(m / wt, 1)})
    out["pagerank"] = {
        "points": pr, "exponent": exponent(g_sizes, [p["seconds"] for p in pr])
    }
    out["triangles"] = {
        "points": tr, "exponent": exponent(g_sizes, [p["seconds"] for p in tr])
    }

    from emf_spark.datax.dedup import containment_pairs
    from emf_spark.operators.templates import mine_templates

    mine_templates(loglines(spark, 10_000)).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up, excluded
    tm_sizes = [200_000, 800_000] if quick else [200_000, 800_000, 3_200_000]
    tm = []
    for n in tm_sizes:
        df = loglines(spark, n).localCheckpoint(eager=True)
        w = _wall(lambda: mine_templates(df))
        tm.append({"lines": n, "seconds": w, "lines_per_s": round(n / w, 1)})
    out["template_mining"] = {
        "points": tm,
        "exponent": exponent(tm_sizes, [p["seconds"] for p in tm]),
    }

    containment_pairs(
        contdocs(spark, 2_000), threshold=0.8
    ).write.format("noop").mode("overwrite").save()  # warm-up, excluded
    ct_sizes = [10_000, 40_000] if quick else [10_000, 40_000, 160_000]
    ct = []
    for n in ct_sizes:
        df = contdocs(spark, n).localCheckpoint(eager=True)
        w = _wall(lambda: containment_pairs(df, threshold=0.8))
        ct.append({"docs": n, "seconds": w, "docs_per_s": round(n / w, 1)})
    out["containment_pairs"] = {
        "points": ct,
        "exponent": exponent(ct_sizes, [p["seconds"] for p in ct]),
        "allpairs_exponent_for_reference": 2.0,
    }

    dest = Path(__file__).resolve().parent.parent / "BENCH" / "SCALE_CURVES.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
