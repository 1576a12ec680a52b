"""URL normalization and domain-suffix longest-match enrichment — the
web-log / crawl-pipeline stages upstream of dedup and filtering:
canonicalize URLs so byte-unequal spellings of the same resource
collide (the dedup prerequisite), and resolve each host against a
suffix table (blocklists, ownership/registrable-domain tables, per-
domain quality tiers) by LONGEST matching label suffix.

Reference analog: the plugin enriches records against small dimension
tables before aggregation (broadcast enrich, operators/enrich.py);
this is that stage for the two web-native key types. The suffix
matcher is the hostname sibling of the CIDR longest-prefix matcher
(operators/cidr.py) and borrows its core idea: turn a hierarchical
longest-match into a FIXED number of equi-joins instead of a fan-out
range join + argmax.

``url_normalize`` — pure Catalyst expression chain (regexp component
extraction + higher-order array ops), no UDF, no shuffle: lowercases
scheme and host, strips the fragment, default ports (``:80`` http /
``:443`` https), trailing host dot and an optional ``www.``; drops
tracking query params (``utm_*`` etc., caller-extensible), sorts the
survivors byte-wise for spelling-insensitive equality, keeps duplicate
keys (both engines sort them identically), empties collapse away;
empty path becomes ``/``. NULL or scheme-less inputs pass through
NULL (quarantine upstream, don't guess).

``suffix_enrich`` — longest-suffix match against a broadcast dim:
level-ℓ candidate key = the host's last ℓ labels, and the dim splits
by label count, so the whole match is ``max_labels`` BROADCAST left
equi-joins coalesced longest-first. Zero fact-side shuffle, zero
fan-out (vs explode-all-suffixes + shuffle argmax), at most one match
per level by construction after the dim-side dedup aggregate; all
``max_labels`` joins pipeline in ONE stage over the scan. Dim entries
deeper than ``max_labels`` raise in-plan (riding the dim prep, which
always executes — it cannot be pruned away silently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# default tracking params stripped by url_normalize: the exact-name set
# plus the utm_ prefix family
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid")
TRACKING_PREFIXES = ("utm_",)

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def url_normalize(
    url: Column,
    strip_www: bool = True,
    tracking_params: tuple = TRACKING_PARAMS,
    tracking_prefixes: tuple = TRACKING_PREFIXES,
) -> Column:
    """Canonical URL string (see module docstring). Scheme-less or
    NULL input -> NULL."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    # component extraction: authority = after ://, up to / ? #
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    # strip the fragment BEFORE extracting the query: a '?' inside the
    # fragment ('https://h/p#f?x=1', SPA '/#/route?x=1') is NOT a query
    # and must not resurface as one (r5 advisory)
    query = F.regexp_extract(
        F.regexp_replace(url, r"#.*", ""), r"\?(.*)", 1
    )

    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"\.$", "")  # trailing root dot
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )

    def _keep(p: Column) -> Column:
        k = F.substring_index(p, "=", 1)
        cond = (p != "") & ~k.isin(*tracking_params)
        for pref in tracking_prefixes:
            cond = cond & ~k.startswith(pref)
        return cond

    q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), _keep)), "&"
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(url.isNull() | (scheme == ""), F.lit(None).cast("string")).otherwise(
        rebuilt
    )


def _canon_suffix(c: Column) -> Column:
    return F.regexp_replace(F.lower(c), r"^\.", "")


def suffix_enrich(
    facts: DataFrame,
    host_col: str,
    dim: DataFrame,
    suffix_col: str,
    attr_cols: list[str],
    max_labels: int = 5,
) -> DataFrame:
    """Enrich ``facts`` with the attrs of the LONGEST dim suffix whose
    labels are a suffix of the host's labels (``a.b.c`` matches dim
    rows ``a.b.c``, ``b.c``, ``c`` — longest wins). Adds
    ``matched_suffix`` + ``attr_cols``; non-matching and NULL hosts
    get NULLs. Duplicate dim suffixes resolve deterministically to the
    attr-struct minimum. Dim rows deeper than ``max_labels`` raise
    in-plan."""
    if max_labels < 1:
        raise ValueError("max_labels must be >= 1")
    out_cols = ["matched_suffix", *attr_cols]
    internals = [f"_sx_s{lvl}" for lvl in range(1, max_labels + 1)] + [
        f"_sx_a{lvl}" for lvl in range(1, max_labels + 1)
    ] + ["_sx_n", "_sx_suffix", "_sx_a"]
    for c in out_cols:
        if c in facts.columns:
            raise ValueError(f"column {c!r} collides with suffix_enrich outputs")
    for c in internals:
        # join-internal names would fail with ambiguous references
        # mid-join (cidr_enrich guards its internals; r5 advisory asked
        # for the same here)
        if c in facts.columns:
            raise ValueError(f"column {c!r} collides with suffix_enrich internals")

    sfx = _canon_suffix(F.col(suffix_col))
    n = F.size(F.split(sfx, r"\."))
    # the guard rides the LABEL COUNT: every per-level filter
    # (_sx_n == lvl) must evaluate it, so neither projection pruning
    # nor filter short-circuiting can skip it for an over-deep row
    n_guarded = F.when(
        n > max_labels,
        F.raise_error(
            F.concat(
                F.lit(f"suffix_enrich: dim suffix deeper than max_labels={max_labels}: "),
                sfx,
            )
        ).cast("int"),
    ).otherwise(n)
    dim_c = (
        dim.select(
            sfx.alias("_sx_suffix"),
            n_guarded.alias("_sx_n"),
            F.struct(*[F.col(a) for a in attr_cols]).alias("_sx_a"),
        )
        .groupBy("_sx_suffix", "_sx_n")
        .agg(F.min("_sx_a").alias("_sx_a"))
    )

    labels = F.split(F.regexp_replace(F.lower(F.col(host_col)), r"\.$", ""), r"\.")
    out = facts
    picks = []
    for lvl in range(max_labels, 0, -1):
        key = F.when(
            F.size(labels) >= lvl, F.array_join(F.slice(labels, -lvl, lvl), ".")
        )
        d = dim_c.filter(F.col("_sx_n") == lvl).select(
            F.col("_sx_suffix").alias(f"_sx_s{lvl}"),
            F.col("_sx_a").alias(f"_sx_a{lvl}"),
        )
        out = out.join(
            F.broadcast(d), on=key == F.col(f"_sx_s{lvl}"), how="left"
        )
        picks.append(lvl)
    best_sfx = F.coalesce(*[F.col(f"_sx_s{l}") for l in picks])
    best_att = F.coalesce(*[F.col(f"_sx_a{l}") for l in picks])
    out = out.withColumn("matched_suffix", best_sfx)
    for a in attr_cols:
        out = out.withColumn(a, best_att[a])
    drop = [f"_sx_s{l}" for l in picks] + [f"_sx_a{l}" for l in picks]
    return out.drop(*drop)
