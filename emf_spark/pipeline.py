"""End-to-end batch pipeline (SURVEY.md §3.2-§3.3 Spark equivalent):

scan(tokenized) -> detokenize (Arrow UDF) -> from_json parse -> validity
split -> broadcast enrich -> fan-out routed write -> windowed salted
two-phase aggregation -> metadata merge -> EMF event assembly ->
per-sink event writes + compression stats.

On a cluster the same composition runs via ``spark-submit --py-files``;
parquet paths become Iceberg tables and nothing else changes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from emf_spark import fixtures
from emf_spark.operators import aggregate as agg
from emf_spark.operators import enrich as enrich_op
from emf_spark.operators import output as output_op
from emf_spark.operators import parse as parse_op
from emf_spark.operators import route as route_op
from emf_spark.tokenizer import with_payload


@dataclass
class PipelineResult:
    parsed: DataFrame
    errors: DataFrame
    enriched: DataFrame
    events: DataFrame
    stats: DataFrame | None = None
    paths: dict = field(default_factory=dict)
    cached: list = field(default_factory=list)


def build_events(
    spark: SparkSession,
    tokenized: DataFrame,
    lookup: DataFrame | None = None,
    window_ms: int = agg.WINDOW_MS,
    key_by_namespace: bool = False,
    persist_parsed: bool = False,
) -> PipelineResult:
    """Compose the logical plan up to assembled EMF events (no writes).

    ``persist_parsed`` caches the slim parsed+windowed intermediate
    (tokens/payload dropped) before the aggregation fan-out — the
    histogram, metadata, and event branches otherwise each recompute
    detokenize+parse. MEMORY_AND_DISK so large inputs spill instead of
    recomputing; on a cluster this is the natural stage boundary to
    checkpoint.
    """
    lookup = lookup if lookup is not None else fixtures.lookup_df(spark)
    parsed_all = parse_op.parse_emf(with_payload(tokenized))
    valid, errors = parse_op.split_valid(parsed_all)
    enriched = enrich_op.enrich(valid, lookup)
    windowed = agg.with_window(enriched, window_ms)
    agg_input = windowed.drop("tokens", "payload")
    cached = []
    if persist_parsed:
        from pyspark import StorageLevel

        agg_input = agg_input.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(agg_input)
    obs = agg.explode_observations(agg_input, key_by_namespace)
    hist = agg.aggregate_histograms(obs, key_by_namespace)
    meta = agg.aggregate_metadata(agg_input, key_by_namespace)
    groups = agg.assemble_groups(hist, meta, key_by_namespace)
    events = output_op.events_json(groups)
    res = PipelineResult(parsed=valid, errors=errors, enriched=enriched, events=events)
    res.cached = cached
    return res


def run(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    lookup: DataFrame | None = None,
    window_ms: int = agg.WINDOW_MS,
    key_by_namespace: bool = False,
    write_routed: bool = True,
) -> PipelineResult:
    """Full job with writes: routed rows, per-sink events, errors, stats."""
    tokenized = spark.read.parquet(input_path)
    res = build_events(
        spark, tokenized, lookup, window_ms, key_by_namespace, persist_parsed=True
    )

    os.makedirs(out_dir, exist_ok=True)
    if write_routed:
        res.paths["routed"] = route_op.write_routed(res.enriched, out_dir)
    res.paths["errors"] = os.path.join(out_dir, "errors")
    res.errors.write.mode("overwrite").parquet(res.paths["errors"])

    events = res.events.persist()
    pq, txt = output_op.write_events(events, out_dir)
    res.paths["events"], res.paths["events_jsonl"] = pq, txt
    res.stats = output_op.compression_stats(events)
    res.paths["stats"] = os.path.join(out_dir, "stats")
    res.stats.write.mode("overwrite").parquet(res.paths["stats"])
    res.stats = spark.read.parquet(res.paths["stats"])  # decoupled from cache
    events.unpersist()
    for c in res.cached:
        c.unpersist()
    return res
