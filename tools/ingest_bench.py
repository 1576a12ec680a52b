"""Incremental-ingest benchmark: minhash_incremental (signature store)
vs full minhash recompute when a new batch lands on an existing corpus.

The claim under test is the 100 TB posture of the signature store:
shingling + permutation minima are ~all of minhash's cost and the
store amortizes them to once per document lifetime, so ingesting a
batch of size b onto a corpus of size N should cost ~O(b) shingling
(+ the banding join over N+b signatures), NOT O(N+b) shingling. The
correctness side (ingest-union == full-corpus pairs) is pinned by
tests/test_datax.py::test_minhash_incremental_matches_full; this tool
records the wall-clock side.

Corpus: the dedup_curve generator (planted O(n) near-dup families).
Usage: python tools/ingest_bench.py [base_n] [batch_n]
Writes BENCH/INGEST.json and prints it.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.dedup_curve import corpus  # noqa: E402

# defaults; overridden from argv inside main() only — parsing at import
# time would misread the argv of any future tool importing from here
# (the dedup_curve.py import-safety fix, ADVICE r3)
BASE_NS = [200_000, 500_000]
BATCH_N = 20_000
# real corpora run hundreds of words per document; at the curve tool's
# 60-word default the O(N+b) banding join dominates and masks the
# shingling the store exists to amortize
N_WORDS = 300


def main():
    global BASE_NS, BATCH_N, N_WORDS
    if len(sys.argv) > 1:
        BASE_NS = [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 2:
        BATCH_N = int(sys.argv[2])
    if len(sys.argv) > 3:
        N_WORDS = int(sys.argv[3])
    from pyspark.sql import functions as F

    from emf_spark.datax import dedup as dd
    from emf_spark.session import get_spark

    spark = get_spark("ingest_bench", cpus=32)
    kw = dict(num_perm=64, bands=16, threshold=0.7, max_bucket=200)
    results = []
    for base_n in BASE_NS:
        results.append(one_size(spark, base_n, kw))
    (Path(__file__).resolve().parent.parent / "BENCH/INGEST.json").write_text(json.dumps(
        {"runs": results,
         "note": "incremental reports only >=1-new-side pairs (old-old "
                 "pairs belong to the ingest that introduced them), so "
                 "incremental_pairs < full_pairs once whole families sit "
                 "in the base; the saving = per-doc shingling+minima, "
                 "which grows with corpus size and doc length while the "
                 "store-read overhead stays flat"}, indent=1))
    print(json.dumps(results))
    spark.stop()


def one_size(spark, BASE_N, kw):
    from pyspark.sql import functions as F

    from emf_spark.datax import dedup as dd

    full = corpus(spark, BASE_N + BATCH_N, n_words=N_WORDS).persist()
    full.count()  # materialize the synthetic corpus outside all timings
    # batch split by id: the generator's family ids exceed n, so take
    # the LAST batch_n ids as "today's batch" (ids are batch-monotonic)
    ids = full.select("doc_id").orderBy(F.col("doc_id").desc()).limit(BATCH_N)
    cutoff = ids.agg(F.min("doc_id")).collect()[0][0]
    base = full.filter(F.col("doc_id") < cutoff)
    batch = full.filter(F.col("doc_id") >= cutoff)

    tmp = tempfile.mkdtemp(prefix="ingest_bench_")
    store = str(Path(tmp) / "sigstore")
    out = {"base_n": BASE_N, "batch_n": BATCH_N, "n_words": N_WORDS}
    try:
        # bootstrap the store with the base corpus (not timed as ingest
        # cost — it is day 0)
        t0 = time.time()
        dd.write_signature_store(base, store, num_perm=64)
        out["bootstrap_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        n_inc = dd.minhash_incremental(batch, store, **kw).count()
        out["incremental_s"] = round(time.time() - t0, 2)
        out["incremental_pairs"] = n_inc

        t0 = time.time()
        n_full = dd.minhash_near_duplicates(
            full, pre_dedupe_exact=False, **kw
        ).count()
        out["full_recompute_s"] = round(time.time() - t0, 2)
        out["full_pairs"] = n_full
        out["speedup"] = round(out["full_recompute_s"] / out["incremental_s"], 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        full.unpersist()
    return out


if __name__ == "__main__":
    main()
