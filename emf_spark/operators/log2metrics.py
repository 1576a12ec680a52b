"""Log-to-metrics derivation — Fluent Bit's ``log_to_metrics`` filter
(counter / gauge / histogram rules over record streams) as ONE
compiled aggregate pass per window.

Reference analog: this filter is the stage that manufactures the
metric streams the EMF aggregator then accumulates
(fluent-bit-emf/aggregator.go) — the write-side twin of the plugin's
own counters, derived from raw log records instead of arriving as EMF.
Conditions reuse the ``modify`` filter's condition grammar
(operators/modify.py: key_exists / no_key / key_value_equals /
key_value_matches / a_key_matches), so one rule language spans the
whole Fluent Bit surface here.

Rules (list of dicts, validated eagerly driver-side):

* ``{"kind": "counter", "name": N, "when": [...]}`` — count matching
  records per window.
* ``{"kind": "gauge", "name": N, "field": K, "when": [...]}`` — LAST
  matching record's ``record[K]`` per window, ordered by ``(ts,
  tiebreak)`` (the A5 last-wins pattern as an algebraic struct-max —
  no window function). Windows with no matching sample emit NULL.
* ``{"kind": "histogram", "name": N, "field": K, "les": [...],
  "when": [...]}`` — CUMULATIVE bucket counts of ``record[K]`` per
  window, one row per ``le`` (feed ``timeseries.histogram_quantile``
  downstream).

Field values read from the ``map<string,string>`` record via
``try_element_at`` + ``try_cast`` to BIGINT — records missing the
field or carrying a non-numeric value simply don't sample (the
filter's skip-bad-records behavior), they never fail the job.

Output is LONG format: ``(*key_cols, bucket_start, metric, le,
value)`` — ``le`` NULL except for histogram rows.

Execution model: the whole rule list COMPILES into a single
map-combinable hash aggregate keyed (keys, window) — every counter,
gauge pick, and histogram bucket is one aggregate expression over ONE
scan, the quality.py one-pass promise — followed by a literal-sized
``explode(array(struct...))`` unpivot (O(windows x rules) rows, the
funnel pattern). One shuffle total; no joins; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from emf_spark.operators.modify import _CONDS, _cond

_KINDS = {"counter", "gauge", "histogram"}


def _validate(rules: list[dict]) -> None:
    if not rules:
        raise ValueError("log_to_metrics needs at least one rule")
    seen = set()
    for r in rules:
        if r.get("kind") not in _KINDS:
            raise ValueError(f"unknown metric kind {r.get('kind')!r}")
        if not r.get("name"):
            raise ValueError("every rule needs a name")
        if r["name"] in seen:
            raise ValueError(f"duplicate metric name {r['name']!r}")
        seen.add(r["name"])
        if r["kind"] in ("gauge", "histogram") and not r.get("field"):
            raise ValueError(f"{r['kind']} rule {r['name']!r} needs a field")
        if r["kind"] == "histogram":
            les = r.get("les")
            if not les or list(les) != sorted(set(les)):
                raise ValueError(
                    f"histogram rule {r['name']!r} needs strictly "
                    "increasing les"
                )
        for c in r.get("when", ()):
            if c[0] not in _CONDS:
                raise ValueError(f"unknown condition {c[0]!r}")


def log_to_metrics(
    df: DataFrame,
    record_col: str,
    ts_col: str,
    tiebreak_col: str,
    rules: list[dict],
    window_seconds: int,
    key_cols: list[str] = (),
) -> DataFrame:
    """Compile ``rules`` over ``df[record_col]`` (map<string,string>)
    into per-(keys, window) metric rows. See module docstring."""
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    _validate(rules)
    rec = F.col(record_col)
    u = F.unix_timestamp(F.col(ts_col))
    bucket = (u - u % window_seconds).alias("bucket_start")

    def gate(r: dict) -> Column:
        g = rec.isNotNull()
        for c in r.get("when", ()):
            g = g & _cond(rec, c)
        return g

    def field(r: dict) -> Column:
        return F.try_element_at(rec, F.lit(r["field"])).try_cast("bigint")

    aggs, outs = [], []
    for i, r in enumerate(rules):
        g = gate(r)
        if r["kind"] == "counter":
            aggs.append(
                F.sum(F.when(g, 1).otherwise(0)).cast("bigint").alias(f"_m{i}")
            )
            outs.append(
                F.struct(
                    F.lit(r["name"]).alias("metric"),
                    F.lit(None).cast("bigint").alias("le"),
                    F.col(f"_m{i}").alias("value"),
                )
            )
        elif r["kind"] == "gauge":
            x = field(r)
            pick = F.max(
                F.when(
                    g & x.isNotNull(),
                    F.struct(
                        u.alias("_t"),
                        F.col(tiebreak_col).alias("_tb"),
                        x.alias("_x"),
                    ),
                )
            )
            aggs.append(pick.alias(f"_m{i}"))
            outs.append(
                F.struct(
                    F.lit(r["name"]).alias("metric"),
                    F.lit(None).cast("bigint").alias("le"),
                    F.col(f"_m{i}")["_x"].alias("value"),
                )
            )
        else:  # histogram
            x = field(r)
            for j, le in enumerate(r["les"]):
                aggs.append(
                    F.sum(
                        F.when(g & x.isNotNull() & (x <= le), 1).otherwise(0)
                    ).cast("bigint").alias(f"_m{i}_{j}")
                )
                outs.append(
                    F.struct(
                        F.lit(r["name"]).alias("metric"),
                        F.lit(int(le)).cast("bigint").alias("le"),
                        F.col(f"_m{i}_{j}").alias("value"),
                    )
                )
    agg = df.groupBy(*key_cols, bucket).agg(*aggs)
    return agg.select(
        *key_cols,
        "bucket_start",
        F.explode(F.array(*outs)).alias("_m"),
    ).select(
        *key_cols,
        "bucket_start",
        F.col("_m")["metric"].alias("metric"),
        F.col("_m")["le"].alias("le"),
        F.col("_m")["value"].alias("value"),
    )
