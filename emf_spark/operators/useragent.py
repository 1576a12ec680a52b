"""User-agent parsing — the browser/OS/device/bot enrichment stage of a
web log pipeline, compiled to a single Catalyst expression.

Every access-log pipeline classifies its traffic before anything else
can be trusted: bot traffic must be split out before rate estimates,
retention, or dedup statistics mean anything, and (family, os, device)
are the standard slice keys of every traffic dashboard. The reference
plugin consumes records an upstream Fluent Bit parser stage already
shaped (parsers.conf's regex parsers feed it; see the parse path
consumed by ``emf/emf.go``); this module is that enrichment stage for
the UA field, expressed Spark-first.

Semantics (ua-parser-core-style ordered first-match rule lists, kept to
a regex subset both Java regex and RE2 execute identically — literals,
char classes, ``(?:...)``, no lookaround — so the DuckDB oracle replays
the exact same rules):

* **family**: first match of bot > edge > opera > firefox > chrome >
  safari > ie, else ``other``. Order is load-bearing exactly as in
  ua-parser: Edge and Opera UAs *contain* ``Chrome/``, Chrome UAs
  contain ``Safari/``, so the specific tokens must win first.
* **version**: the family's own version token (``Version/x`` for
  Safari, ``rv:x``/``MSIE x`` for IE, the product token otherwise);
  NULL when the family carries none (bots, ``other``).
* **major**: leading integer of ``version`` as int, NULL with it.
* **os / os_version**: windows (NT version) > android (before the
  generic ``linux`` token it also carries) > ios (``OS x_y`` with
  ``_`` → ``.``) > macos > linux > other.
* **device**: ``bot`` > tablet (``ipad``/``tablet``) > mobile
  (``mobile``/``iphone``/``ipod``) > android-without-``mobile`` =
  tablet (the Android UA convention) > desktop.
* NULL input → NULL struct; matching is case-insensitive via one
  ``lower()`` (no per-rule ``(?i)`` — RE2 and Java disagree on
  inline-flag scoping corners, lowercasing once sidesteps the class).

Execution model: the whole classifier folds into ONE narrow projection
— a ``CASE`` chain of ``rlike`` guards with ``regexp_extract`` only
under a matching guard (both engines return their no-match sentinel
differently, so extraction is always guard-gated and the no-match path
is an explicit NULL on both). No UDF, no explode, no shuffle: at
100 TB this costs only the scan it rides on, and Catalyst prunes the
struct to whichever fields the query actually reads.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ordered (family, guard regex, version regex) — first match wins; all
# patterns run against the LOWERCASED ua and stay in the Java∩RE2 subset
_BOT = r"(bot|crawler|spider|crawling|curl/|wget/|python-requests|go-http-client|httpclient)"
_FAMILY_RULES: list[tuple[str, str, str | None]] = [
    ("bot", _BOT, None),
    ("edge", r"edg[a-z]*/", r"edg[a-z]*/([0-9][0-9.]*)"),
    ("opera", r"(opr/|opera)", r"(?:opr|opera)[/ ]([0-9][0-9.]*)"),
    ("firefox", r"firefox/", r"firefox/([0-9][0-9.]*)"),
    ("chrome", r"(chrome|crios)/", r"(?:chrome|crios)/([0-9][0-9.]*)"),
    ("safari", r"safari", r"version/([0-9][0-9.]*)"),
    ("ie", r"(msie |trident/)", r"(?:msie |rv:)([0-9][0-9.]*)"),
]

_OS_RULES: list[tuple[str, str, str | None]] = [
    ("windows", r"windows nt", r"windows nt ([0-9][0-9.]*)"),
    ("android", r"android", r"android ([0-9][0-9.]*)"),
    ("ios", r"(iphone|ipad|ipod)", r" os ([0-9][0-9_]*)"),
    ("macos", r"mac os x", r"mac os x ([0-9][0-9_.]*)"),
    ("linux", r"linux", None),
]


def _extract(lua: Column, pat: str | None) -> Column:
    """Guard-gated capture: NULL unless the version token matches."""
    if pat is None:
        return F.lit(None).cast("string")
    return F.when(lua.rlike(pat), F.regexp_extract(lua, pat, 1))


def parse_user_agent(ua: Column) -> Column:
    """Classify a raw User-Agent string column.

    Returns ``struct<family, version, major:int, os, os_version,
    device, is_bot:boolean>`` (NULL struct for NULL input). Pure
    expression — see module docstring for the rule table and the
    scale argument.
    """
    lua = F.lower(ua)

    family = None
    for name, guard, _ in reversed(_FAMILY_RULES):
        tail = F.lit("other") if family is None else family
        family = F.when(lua.rlike(guard), F.lit(name)).otherwise(tail)

    version = F.lit(None).cast("string")
    for name, guard, vpat in reversed(_FAMILY_RULES):
        version = F.when(lua.rlike(guard), _extract(lua, vpat)).otherwise(version)

    os_name = F.lit("other")
    os_version = F.lit(None).cast("string")
    for name, guard, vpat in reversed(_OS_RULES):
        os_name = F.when(lua.rlike(guard), F.lit(name)).otherwise(os_name)
        v = _extract(lua, vpat)
        if name == "ios":
            v = F.replace(v, F.lit("_"), F.lit("."))
        os_version = F.when(lua.rlike(guard), v).otherwise(os_version)

    is_bot = lua.rlike(_BOT)
    device = (
        F.when(is_bot, F.lit("bot"))
        .when(lua.rlike(r"(ipad|tablet)"), F.lit("tablet"))
        .when(lua.rlike(r"(mobile|iphone|ipod)"), F.lit("mobile"))
        # Android UA convention: an android token WITHOUT 'mobile' is a
        # tablet (the preceding branch already caught android phones)
        .when(lua.rlike(r"android"), F.lit("tablet"))
        .otherwise(F.lit("desktop"))
    )

    major = F.when(
        version.isNotNull(), F.regexp_extract(version, r"^([0-9]+)", 1)
    ).cast("int")

    return F.when(
        ua.isNotNull(),
        F.struct(
            family.alias("family"),
            version.alias("version"),
            major.alias("major"),
            os_name.alias("os"),
            os_version.alias("os_version"),
            device.alias("device"),
            is_bot.alias("is_bot"),
        ),
    )
