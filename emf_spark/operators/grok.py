"""Grok-style regex parsing for text log lines (north rule: "grok/regex
parse, lookup enrich, fan-out sinks").

A compact grok -> Java-regex compiler over the well-known public pattern
names (the grok pattern language is the fluentd/logstash lingua franca;
the reference's EMF input arrives pre-structured, so this is the leg the
north star adds for plain-text telemetry). Extraction happens with one
Catalyst ``regexp_extract`` per named capture — JVM-side, codegen'd, no
UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# Public base patterns (reimplemented subset of the standard grok
# library; entries may reference other entries with %{NAME} — nested
# composition is expanded recursively by compile_grok, including the
# library patterns that carry their OWN named captures, e.g.
# %{COMBINEDAPACHELOG} alone yields clientip/verb/response/... fields,
# exactly like logstash).
GROK_PATTERNS: dict[str, str] = {
    # atoms
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"[0-9A-Fa-f]+",
    "UUID": r"[0-9A-Fa-f]{8}-(?:[0-9A-Fa-f]{4}-){3}[0-9A-Fa-f]{12}",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*')",
    "QS": "%{QUOTEDSTRING}",
    # network
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}(?:%\w+)?",
    "IP": r"(?:%{IPV4}|%{IPV6})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"[\w.\-]+",
    "HOSTPORT": "%{IPORHOST}:%{POSINT}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": "%{USERNAME}",
    "EMAILADDRESS": r"[a-zA-Z0-9_.+-]+@[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)+",
    # date/time
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": "%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_US": "%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": "%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": "(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP": "%{DATE}[- ]%{TIME}",
    "ISO8601_TIMEZONE": "(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "SYSLOGTIMESTAMP": "%{MONTH} +%{MONTHDAY} %{TIME}",
    # syslog family (nested NAMED refs: %{SYSLOGBASE} alone yields
    # timestamp/logsource/program/pid)
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": "%{IPORHOST}",
    "SYSLOGBASE": "%{SYSLOGTIMESTAMP:timestamp} %{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    # the classic whole-line composite (logstash SYSLOGLINE): one ref
    # yields timestamp/logsource/program/pid/message
    "SYSLOGLINE": "%{SYSLOGBASE} %{GREEDYDATA:message}",
    # http
    "HTTPMETHOD": r"GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH",
    "URIPATH": r"/[^\s?]*",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": "%{URIPATH}(?:%{URIPARAM})?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # paths / misc
    "UNIXPATH": r"(?:/[\w_%!$@:.,~-]+)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "PATH": "(?:%{UNIXPATH}|%{WINPATH})",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?(?:/[0-9]+)?",
    "MAC": r"(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}",
    "HTTPDUSER": "(?:%{EMAILADDRESS}|%{USER})",
    "CISCOTIMESTAMP": "%{MONTH} +%{MONTHDAY}(?: %{YEAR})? %{TIME}",
    "DATESTAMP_RFC822": "%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "TZ": r"(?:[A-Z]{3,4}|[+-]\d{4})",
    "DATESTAMP_EVENTLOG": r"\d{14}",
    # more network atoms
    "CIDR": "%{IPV4}/\\d{1,2}",
    "MACADDR": "%{MAC}",
    "PORT": r"\b(?:[1-9]\d{0,3}|[1-5]\d{4}|6[0-4]\d{3}|65[0-4]\d{2}|655[0-2]\d|6553[0-5])\b",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
    "URIHOST": "%{IPORHOST}(?::%{POSINT})?",
    "URI": "%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?%{URIHOST}(?:%{URIPATHPARAM})?",
    # date/time variants
    "DATESTAMP_RFC2822": "%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": "%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "HTTPDERROR_DATE": "%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    # syslog 5424 (structured syslog; PRI/version/ids)
    "SYSLOG5424PRI": r"<\d{1,3}>",
    "SYSLOG5424SD": r"\[.*?\]|-",
    "SYSLOG5424BASE": (
        r"%{SYSLOG5424PRI:syslog5424_pri}%{NONNEGINT:syslog5424_ver} "
        r"(?:-|%{TIMESTAMP_ISO8601:syslog5424_ts}) (?:-|%{IPORHOST:syslog5424_host}) "
        r"(?:-|%{PROG:syslog5424_app}) (?:-|%{POSINT:syslog5424_proc}) "
        r"(?:-|%{WORD:syslog5424_msgid}) (?:%{SYSLOG5424SD:syslog5424_sd}|-)"
    ),
    "SYSLOG5424LINE": "%{SYSLOG5424BASE} +%{GREEDYDATA:syslog5424_msg}",
    # app/infra composites (public logstash shapes)
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[A-Za-z0-9_. -]+)",
    "JAVASTACKTRACEPART": r"\s+at %{JAVACLASS:class}\.%{WORD:method}\(%{JAVAFILE:file}(?::%{NONNEGINT:line})?\)",
    "CATALINA_DATESTAMP": "%{MONTH} %{MONTHDAY}, %{YEAR} %{HOUR}:%{MINUTE}:%{SECOND} (?:AM|PM)",
    "REDISTIMESTAMP": "%{MONTHDAY} %{MONTH} %{TIME}",
    "REDISLOG": r"\[%{POSINT:pid}\] %{REDISTIMESTAMP:timestamp} \* ",
    "CRON_ACTION": r"[A-Z ]+",
    "CRONLOG": "%{SYSLOGBASE} \\(%{USER:user}\\) %{CRON_ACTION:action} \\(%{DATA:message}\\)",
    "HTTPD_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] "
        r"(?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:message}"
    ),
    # apache access logs (the two classic library composites)
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] "
        r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?'
        r'|%{DATA:rawrequest})" '
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": "%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

# grok type-coercion suffixes (logstash semantics): %{INT:status:int}
_GROK_TYPES = {"int": "bigint", "long": "bigint", "float": "double", "double": "double"}

_MAX_DEPTH = 16


def _expand(
    pattern: str, fields: list[tuple[str, str | None]], depth: int,
    library: dict[str, str],
) -> str:
    """Recursively expand %{BASE[:name[:type]]} refs against
    ``library``. Named refs open a capture group BEFORE their body
    expands, so the fields list stays in regex group order even with
    nested named captures."""
    if depth > _MAX_DEPTH:
        raise KeyError("grok pattern nesting too deep (cycle?)")
    out, pos = [], 0
    for m in _GROK_REF.finditer(pattern):
        out.append(pattern[pos:m.start()])
        base, name, typ = m.group(1), m.group(2), m.group(3)
        if base not in library:
            raise KeyError(f"unknown grok pattern %{{{base}}}")
        if typ is not None and typ not in _GROK_TYPES:
            raise KeyError(f"unknown grok type suffix :{typ}")
        if name:
            fields.append((name, _GROK_TYPES.get(typ)))
            out.append("(")
            out.append(_expand(library[base], fields, depth + 1, library))
            out.append(")")
        else:
            out.append("(?:")
            out.append(_expand(library[base], fields, depth + 1, library))
            out.append(")")
        pos = m.end()
    out.append(pattern[pos:])
    return "".join(out)


def compile_grok(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str | None]]]:
    """grok pattern -> (regex with one capture group per named field,
    [(field, cast-type-or-None)] in group order). Refs expand
    RECURSIVELY: a library pattern may reference others, and nested
    named captures (e.g. inside %{COMBINEDAPACHELOG}) surface as
    fields, logstash-style. Unnamed refs become non-capturing;
    ``%{BASE:name:int}`` casts like logstash.

    ``extra_patterns`` registers user atoms at compile time (the
    fluentd/logstash ``patterns_dir`` migration path): entries may
    reference library patterns AND each other, and may OVERRIDE a
    library name (user wins). Self/mutual recursion is caught by the
    depth guard (a cycle exceeds _MAX_DEPTH and raises KeyError
    rather than expanding forever)."""
    library = {**GROK_PATTERNS, **extra_patterns} if extra_patterns else GROK_PATTERNS
    fields: list[tuple[str, str | None]] = []
    regex = _expand(pattern, fields, 0, library)
    # group-count validation: a raw capturing '(' inside a user (or
    # library) pattern body silently shifts every later $n reference,
    # mapping fields to the WRONG captures (review finding). The
    # compiler owns all intended groups (one per named field), so the
    # compiled regex must have exactly len(fields) groups.
    try:
        n_groups = re.compile(regex).groups
    except re.error:
        n_groups = None  # Java-only syntax — cannot validate, pass through
    if n_groups is not None and n_groups != len(fields):
        raise ValueError(
            f"pattern expands to {n_groups} regex groups for "
            f"{len(fields)} named fields — a pattern body contains a raw "
            "capturing '('; use '(?:...)' for grouping inside patterns"
        )
    return regex, fields


# field / match sentinels for the single-pass extraction (ASCII unit /
# record separators — never present in sane log lines; a line containing
# them would mis-split, documented limitation)
_FS = "\x1f"
_MS = "\x1e"


def grok_extract(
    df: DataFrame, line_col: str, pattern: str, drop_unmatched: bool = True,
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Extract one column per named grok field (cast when the field has
    a type suffix); a non-matching line yields empty strings (grok
    convention) and is dropped when ``drop_unmatched`` (the malformed
    side-output analog of P1).

    The regex executes ONCE per row: a single regexp_replace rewrites
    the first match into a sentinel-prefixed, unit-separator-delimited
    field string which then splits columnar-ly — composed library
    patterns like %{COMBINEDAPACHELOG} carry 12 captures, and the naive
    one-regexp_extract-per-field form re-ran the (backtracking) pattern
    13x per row (measured 3x wall on the 1M-line accesslog query)."""
    regex, fields = compile_grok(pattern, extra_patterns)
    repl = _MS + _FS.join(f"${i}" for i in range(1, len(fields) + 1))
    # lazy prefix + greedy tail: the whole line rewrites to the field
    # string of the FIRST regex match (regexp_extract semantics)
    wrapper = "(?s)^.*?" + regex + ".*$"
    # materialize the rewrite and the split ONCE as real columns —
    # attribute refs, not repeated expression copies (Project-level CSE
    # is not guaranteed across 12 withColumns)
    # strip the sentinels from input first: a raw line starting with
    # \x1e would otherwise read as "matched", and an embedded \x1f
    # would skew the split (control separators are not log content)
    clean = F.translate(F.col(line_col), _MS + _FS, "")
    out = df.withColumn(
        "_grok", F.regexp_replace(clean, wrapper, repl)
    ).withColumn(
        "_grok_arr",
        F.split(F.substring(F.col("_grok"), 2, 2_000_000_000), _FS),
    )
    is_match = F.startswith(F.col("_grok"), F.lit(_MS))
    for i, (name, typ) in enumerate(fields, start=1):
        # F.get: null (not an ANSI throw) if a stray separator in the
        # line skewed the split arity
        col = F.when(
            is_match, F.coalesce(F.get(F.col("_grok_arr"), i - 1), F.lit(""))
        ).otherwise(F.lit(""))
        if typ is not None:
            col = col.try_cast(typ)
        out = out.withColumn(name, col)
    if drop_unmatched:
        out = out.filter(is_match)
    return out.drop("_grok", "_grok_arr")


# A ready-made pattern for the classic combined access-log shape.
COMMON_LOG = (
    "%{IPORHOST:client} %{USER:ident} %{USER:auth} "
    r"\[%{HTTPDATE:ts}\] "
    '"%{HTTPMETHOD:method} %{URIPATH:path}[^"]*" '
    "%{INT:status} %{INT:bytes}"
)
