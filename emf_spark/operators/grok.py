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

# Public base patterns (subset of the standard grok library).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"[0-9A-Fa-f]+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPORHOST": r"[\w.\-]+",
    "USER": r"[\w.\-]+",
    "HTTPMETHOD": r"GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH",
    "URIPATH": r"/[^\s?]*",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "QS": r'"[^"]*"',
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

# grok type-coercion suffixes (logstash semantics): %{INT:status:int}
_GROK_TYPES = {"int": "bigint", "long": "bigint", "float": "double", "double": "double"}


def compile_grok(pattern: str) -> tuple[str, list[tuple[str, str | None]]]:
    """grok pattern -> (regex with one capture group per named field,
    [(field, cast-type-or-None)] in group order). Unnamed refs become
    non-capturing; ``%{BASE:name:int}`` casts like logstash."""
    fields: list[tuple[str, str | None]] = []

    def sub(m: re.Match) -> str:
        base, name, typ = m.group(1), m.group(2), m.group(3)
        if base not in GROK_PATTERNS:
            raise KeyError(f"unknown grok pattern %{{{base}}}")
        if typ is not None and typ not in _GROK_TYPES:
            raise KeyError(f"unknown grok type suffix :{typ}")
        body = GROK_PATTERNS[base]
        if name:
            fields.append((name, _GROK_TYPES.get(typ)))
            return f"({body})"
        return f"(?:{body})"

    regex = _GROK_REF.sub(sub, pattern)
    return regex, fields


def grok_extract(
    df: DataFrame, line_col: str, pattern: str, drop_unmatched: bool = True
) -> DataFrame:
    """Extract one column per named grok field (cast when the field has
    a type suffix); a non-matching line yields empty strings (Spark
    regexp_extract semantics) and is dropped when ``drop_unmatched``
    (the malformed side-output analog of P1)."""
    regex, fields = compile_grok(pattern)
    out = df
    for i, (name, typ) in enumerate(fields, start=1):
        col = F.regexp_extract(F.col(line_col), regex, i)
        if typ is not None:
            col = col.try_cast(typ)
        out = out.withColumn(name, col)
    if drop_unmatched:
        out = out.filter(F.col(line_col).rlike(regex))
    return out


# A ready-made pattern for the classic combined access-log shape.
COMMON_LOG = (
    "%{IPORHOST:client} %{USER:ident} %{USER:auth} "
    r"\[%{HTTPDATE:ts}\] "
    '"%{HTTPMETHOD:method} %{URIPATH:path}[^"]*" '
    "%{INT:status} %{INT:bytes}"
)
