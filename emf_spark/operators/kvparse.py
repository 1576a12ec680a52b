"""Key-value line parsers — Fluent Bit's ``logfmt`` and ``ltsv``
parsers as compiled Catalyst expressions over string columns.

The reference plugin consumes records a parser stage upstream already
decoded (its input is Fluent Bit's msgpack record stream; the
``logfmt``/``ltsv`` parsers in fluent-bit's parser family are the
stage that turns raw log lines into those records, upstream of
emf/emf.go's parse path). grok (operators/grok.py) covers the regex
family; this module covers the two structured-text families.

Grammar (logfmt, the Heroku dialect the Fluent Bit parser follows):

* ``key=value`` — bare values run to the next whitespace
* ``key="quoted value"`` — quoted values may contain whitespace, ``=``
  and ``\\"`` / ``\\\\`` escapes (unescaped on output)
* ``key=`` — explicit empty-string value
* ``key`` (no ``=``) — boolean flag, parsed as ``"true"``
* duplicate keys — LAST wins (stream-processing convention: later
  writes shadow earlier ones)
* bytes between pairs that match no key syntax are skipped, same as
  the reference parser's scanner

Execution model: ONE regexp scan of the line (two ``regexp_extract_all``
calls over the SAME pattern — group 1 keys, group 2 raw values; equal
match counts by construction since both walk identical match spans),
zipped and folded into a last-wins map with ``aggregate`` over the
(tiny, per-line) pair array. No explode, no UDF, no shuffle: a narrow
projection that pipelines inside the scan's codegen stage, so at
100 TB it costs only the scan it rides on. NULL lines parse to NULL;
pair-free lines parse to an empty map.

LTSV (Labeled Tab-Separated Values): tab-separated ``label:value``
fields, first ``:`` splits, same last-wins fold; fields with no ``:``
are skipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# key, then optionally '=' + (quoted-with-escapes | bare-non-space)
_LOGFMT_PAIR = r'([A-Za-z_][A-Za-z0-9_.\-/]*)(=("(?:[^"\\]|\\.)*"|[^\s]*))?'


def _last_wins(entries: Column) -> Column:
    """Fold an array<struct<k,v>> into a map where later entries shadow
    earlier ones. O(pairs^2) per record — pairs per log line are tiny
    and bounded by line length; stays a pure expression (no UDF)."""
    return F.aggregate(
        entries,
        F.create_map().cast("map<string,string>"),
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, v: k != e["k"]),
            F.create_map(e["k"], e["v"]),
        ),
    )


def parse_logfmt(line: Column) -> Column:
    """Parse a logfmt line into ``map<string,string>`` (see module
    docstring for the grammar). Pure-expression: two aligned regexp
    scans + an in-row fold."""
    keys = F.regexp_extract_all(line, F.lit(_LOGFMT_PAIR), 1)
    raws = F.regexp_extract_all(line, F.lit(_LOGFMT_PAIR), 2)
    pairs = F.zip_with(
        keys,
        raws,
        lambda k, raw: F.struct(k.alias("k"), _decode_logfmt_value(raw).alias("v")),
    )
    return F.when(line.isNull(), F.lit(None).cast("map<string,string>")).otherwise(
        _last_wins(pairs)
    )


def _decode_logfmt_value(raw: Column) -> Column:
    """raw carries the leading '=' when present: '' => bare flag
    ("true"); '=' => empty string; '="..."' => unquote + unescape;
    '=v' => v."""
    v = raw.substr(F.lit(2), F.length(raw))  # strip the '='
    quoted = v.startswith('"')
    unquoted = F.regexp_replace(
        v.substr(F.lit(2), F.length(v) - 2), r"\\(.)", "$1"
    )
    return (
        F.when(raw == "", F.lit("true"))
        .when(quoted, unquoted)
        .otherwise(v)
    )


def parse_ltsv(line_col: str) -> Column:
    """Parse an LTSV line (tab-separated ``label:value``) into
    ``map<string,string>``. First ``:`` splits (values may contain
    ``:``); colon-less fields are skipped; duplicate labels last-win;
    NULL lines parse to NULL. Takes the COLUMN NAME (the in-row fold
    needs a SQL-visible reference)."""
    pairs = F.expr(
        f"transform(filter(split({line_col}, '\t'), f -> instr(f, ':') > 0), "
        "f -> struct(substring_index(f, ':', 1) as k, "
        "substring(f, instr(f, ':') + 1) as v))"
    )
    line = F.col(line_col)
    return F.when(line.isNull(), F.lit(None).cast("map<string,string>")).otherwise(
        _last_wins(pairs)
    )


def logfmt_records(df: DataFrame, line_col: str, out_col: str = "record") -> DataFrame:
    """Attach the parsed logfmt map of ``df[line_col]`` as ``out_col``."""
    return df.withColumn(out_col, parse_logfmt(F.col(line_col)))


def ltsv_records(df: DataFrame, line_col: str, out_col: str = "record") -> DataFrame:
    """Attach the parsed LTSV map of ``df[line_col]`` as ``out_col``."""
    return df.withColumn(out_col, parse_ltsv(line_col))
