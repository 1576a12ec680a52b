"""ANN recall report (VERDICT r1 item 10): recall@k of the LSH and IVF
paths (seed + k-means-refined centroids) vs exact brute-force cosine,
averaged over query vectors from the embeddings table.

Usage: python tools/ann_recall.py [sf_dir] [n_queries]
Prints one JSON line; recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 20
K = 10


def main():
    from pyspark.sql import functions as F

    from emf_spark.datax import similarity as sim
    from emf_spark.session import get_spark

    import time

    spark = get_spark("ann_recall", cpus=8, shuffle_partitions=8)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qrows = e.orderBy("vec_id").limit(NQ).collect()
    # materialized-bucket probe path (VERDICT r2 items 3/10): same
    # planes/seed as lsh_topk, partition-pruned scan per query
    bpath = f"/tmp/ann_recall_buckets_{Path(SF).name}"
    sim.materialize_buckets(e, bpath, n_planes=6)
    # r must exceed the latent cluster count for IVF lists to separate
    # them (sf embeddings carry 10 labeled clusters; r=8 capped recall
    # at ~0.8, r=16 + 3 Lloyd iterations reaches >= 0.9 at n_probe=4)
    seeds = sim.deterministic_centroids(e, r=16)
    refined = sim.kmeans_refine(e, seeds, iters=3)

    planes = sim._hyperplanes(len(qrows[0]["embedding"]), 6, 42)
    recalls = {"lsh": [], "lsh_bucketed": [], "ivf_seed": [], "ivf_refined": []}
    secs = {"lsh": 0.0, "lsh_bucketed": 0.0}
    for q in qrows:
        qid, qvec = q["vec_id"], [float(x) for x in q["embedding"]]
        rest = e.filter(F.col("vec_id") != qid)
        truth = {r["id"] for r in sim.cosine_topk(rest, qvec, k=K).collect()}
        ball = sim._hamming_ball(sim._query_bucket(qvec, planes), 6, 3)
        pruned = (
            spark.read.parquet(bpath)
            .filter(F.col("_bucket").isin(ball))
            .filter(F.col("vec_id") != qid)
        )
        for name, df in {
            "lsh": sim.lsh_topk(rest, qvec, k=K, n_planes=6, probe_hamming=3),
            "lsh_bucketed": sim.cosine_topk(pruned, qvec, k=K),
            "ivf_seed": sim.ivf_topk(rest, qvec, seeds, k=K, n_probe=4),
            "ivf_refined": sim.ivf_topk(rest, qvec, refined, k=K, n_probe=4),
        }.items():
            t0 = time.time()
            got = {r["id"] for r in df.collect()}
            if name in secs:
                secs[name] += time.time() - t0
            recalls[name].append(len(got & truth) / len(truth))
    out = {
        "sf": Path(SF).name,
        "k": K,
        "n_queries": NQ,
        **{f"recall_{n}": round(sum(v) / len(v), 4) for n, v in recalls.items()},
        **{f"seconds_per_query_{n}": round(s / NQ, 3) for n, s in secs.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
