"""Grok/regex parse leg (north rule) — compiler + extraction."""

from __future__ import annotations

import pytest

from emf_spark.operators.grok import COMMON_LOG, compile_grok, grok_extract


def test_compile_grok_fields():
    regex, fields = compile_grok("%{IP:client} %{WORD:method} %{NUMBER:ms}")
    assert fields == [("client", None), ("method", None), ("ms", None)]
    import re

    m = re.fullmatch(regex, "10.0.0.1 GET 12.5")
    assert m and m.groups() == ("10.0.0.1", "GET", "12.5")


def test_compile_unknown_pattern():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")


def test_grok_extract_dataframe(spark):
    lines = [
        ('10.0.0.1 - alice [12/Mar/2025:10:00:00 +0000] "GET /api/x?q=1" 200 123',),
        ('10.0.0.2 - bob [12/Mar/2025:10:00:01 +0000] "POST /api/y" 500 45',),
        ("totally unparseable garbage",),
    ]
    df = spark.createDataFrame(lines, "line string")
    out = grok_extract(df, "line", COMMON_LOG)
    rows = {r["client"]: r for r in out.collect()}
    assert set(rows) == {"10.0.0.1", "10.0.0.2"}  # garbage dropped
    assert rows["10.0.0.1"]["method"] == "GET"
    assert rows["10.0.0.1"]["path"] == "/api/x"
    assert rows["10.0.0.1"]["status"] == "200"
    assert rows["10.0.0.2"]["auth"] == "bob"


def test_grok_keep_unmatched(spark):
    df = spark.createDataFrame([("a 1",), ("junk",)], "line string")
    out = grok_extract(df, "line", "%{WORD:w} %{INT:n}", drop_unmatched=False)
    assert out.count() == 2


def test_grok_type_suffix(spark):
    df = spark.createDataFrame(
        [("GET 200 12.5",), ("POST nope 1.0",)], "line string"
    )
    out = grok_extract(
        df, "line", "%{WORD:m} %{WORD:status:int} %{NUMBER:ms:float}",
        drop_unmatched=False,
    )
    rows = {r["m"]: r for r in out.collect()}
    assert rows["GET"]["status"] == 200 and rows["GET"]["ms"] == 12.5
    assert rows["POST"]["status"] is None  # try_cast of 'nope'
    assert dict(out.dtypes)["status"] == "bigint"
    assert dict(out.dtypes)["ms"] == "double"


def test_compile_unknown_type_suffix():
    with pytest.raises(KeyError):
        compile_grok("%{INT:x:datetime}")


def test_nested_composition_combined_accesslog(spark):
    """One library ref expands recursively and surfaces the nested
    named captures (logstash semantics)."""
    line = (
        '192.168.1.20 - alice [10/Oct/2024:13:55:36 +0000] '
        '"POST /api/orders?id=7 HTTP/1.1" 201 512 '
        '"http://example.com/start" "curl/8.1"'
    )
    df = spark.createDataFrame([(line,)], "line string")
    out = grok_extract(df, "line", "%{COMBINEDAPACHELOG}").collect()
    assert len(out) == 1
    r = out[0]
    assert r["clientip"] == "192.168.1.20" and r["auth"] == "alice"
    assert r["verb"] == "POST" and r["request"] == "/api/orders?id=7"
    assert r["httpversion"] == "1.1"
    assert r["response"] == "201" and r["bytes"] == "512"
    assert r["referrer"] == '"http://example.com/start"'
    assert r["agent"] == '"curl/8.1"'


def test_nested_composition_syslog(spark):
    df = spark.createDataFrame(
        [
            ("Mar 12 14:01:02 web-01 sshd[4321]: Accepted publickey",),
            ("Jul  3 01:59:60 db9 cron: job done",),  # double space + no pid
            ("not a syslog line",),
        ],
        "line string",
    )
    out = grok_extract(df, "line", "%{SYSLOGBASE} %{GREEDYDATA:msg}").collect()
    by = {r["logsource"]: r for r in out}
    assert set(by) == {"web-01", "db9"}  # non-matching line dropped
    assert by["web-01"]["program"] == "sshd" and by["web-01"]["pid"] == "4321"
    assert by["db9"]["program"] == "cron" and by["db9"]["pid"] == ""
    assert by["db9"]["timestamp"] == "Jul  3 01:59:60"


def test_syslogline_composite():
    """%{SYSLOGLINE} alone surfaces timestamp/logsource/program/pid/
    message (nested composition through SYSLOGBASE/SYSLOGPROG)."""
    import re

    rx, fields = compile_grok("%{SYSLOGLINE}")
    assert [f for f, _ in fields] == [
        "timestamp", "logsource", "program", "pid", "message"]
    m = re.fullmatch(rx, "Mar 12 10:00:01 host-7 svc-view[1234]: evt uid=9")
    assert m and m.group(3) == "svc-view" and m.group(4) == "1234"
    assert m.group(5) == "evt uid=9"
    m2 = re.fullmatch(rx, "Mar 12 10:00:01 host-7 svc-view: evt uid=9")
    assert m2 and m2.group(3) == "svc-view" and m2.group(4) is None


def test_quotedstring_and_timestamp_variants():
    import re

    rx, _ = compile_grok("%{QS:q}")
    assert re.fullmatch(rx, '"escaped \\" quote"')
    assert re.fullmatch(rx, "'single'")
    rx2, _ = compile_grok("%{DATESTAMP:d}")
    assert re.fullmatch(rx2, "12/31/2024 23:59:59")  # US
    assert re.fullmatch(rx2, "31.12.2024 23:59:59")  # EU
    rx3, _ = compile_grok("%{TIMESTAMP_ISO8601:t}")
    assert re.fullmatch(rx3, "2024-12-31T23:59:59.123+02:00")


def test_cycle_guard():
    from emf_spark.operators.grok import GROK_PATTERNS

    GROK_PATTERNS["_SELFREF"] = "x%{_SELFREF}"
    try:
        with pytest.raises(KeyError, match="too deep"):
            compile_grok("%{_SELFREF}")
    finally:
        del GROK_PATTERNS["_SELFREF"]


def test_extra_patterns_registration(spark):
    """Runtime pattern registration (VERDICT r3 item 8 — the fluentd
    patterns_dir migration path): user atoms compose with the library,
    reference each other, and extraction uses ONE composed regex."""
    extra = {
        "REQID": r"req-[0-9a-f]{6}",
        # a custom pattern composing a library atom AND another custom
        "REQLINE": "%{REQID:rid} user=%{USERNAME:user}",
    }
    regex, fields = compile_grok(
        "%{REQLINE} ms=%{INT:ms:int}", extra_patterns=extra
    )
    assert [f for f, _ in fields] == ["rid", "user", "ms"]
    df = spark.createDataFrame(
        [("req-00ab12 user=alice ms=42",), ("garbage",)], "line string"
    )
    rows = grok_extract(
        df, "line", "%{REQLINE} ms=%{INT:ms:int}", extra_patterns=extra
    ).collect()
    assert [(r["rid"], r["user"], r["ms"]) for r in rows] == [
        ("req-00ab12", "alice", 42)
    ]


def test_extra_patterns_override_and_isolation():
    """A user pattern may OVERRIDE a library name (user wins) without
    mutating the shared library; compiles without extras are
    unaffected."""
    rx_default, _ = compile_grok("%{WORD:w}")
    rx_over, _ = compile_grok(
        "%{WORD:w}", extra_patterns={"WORD": r"[A-Z]+"}
    )
    assert rx_over == "([A-Z]+)" and rx_default != rx_over
    # library untouched: a fresh default compile is unchanged
    assert compile_grok("%{WORD:w}")[0] == rx_default


def test_extra_patterns_cycle_guard():
    """Self- and mutual-recursion via extra_patterns hit the depth
    guard instead of expanding forever."""
    with pytest.raises(KeyError, match="too deep"):
        compile_grok("%{A}", extra_patterns={"A": "x%{A}"})
    with pytest.raises(KeyError, match="too deep"):
        compile_grok(
            "%{A}", extra_patterns={"A": "%{B}!", "B": "?%{A}"}
        )
    # unknown ref inside an extra pattern still reports cleanly
    with pytest.raises(KeyError, match="unknown grok pattern"):
        compile_grok("%{A}", extra_patterns={"A": "%{NOPE}"})


def test_sentinel_bytes_in_input_cannot_spoof_match(spark):
    # raw lines carrying the internal \x1e / \x1f sentinels must not
    # read as matched or skew the field split
    df = spark.createDataFrame(
        [("\x1enot a real match",), ("w1\x1f 42",), ("ok 7",)], "line string"
    )
    out = grok_extract(df, "line", "%{WORD:w} %{INT:n:int}").collect()
    got = {r["w"]: r["n"] for r in out}
    assert got == {"w1": 42, "ok": 7}


def test_pattern_tranche_2():
    import re

    cases = [
        ("%{UNIXPATH:p}", "/var/log/app-1.log"),
        ("%{WINPATH:p}", r"C:\Users\dev\file.txt"),
        ("%{MAC:m}", "0a:1b:2c:3d:4e:5f"),
        ("%{HTTPDUSER:u}", "dev@example.com"),
        ("%{CISCOTIMESTAMP:t}", "Mar  1 12:00:01"),
        ("%{TZ:z}", "+0200"),
        ("%{DATESTAMP_EVENTLOG:t}", "20240101123000"),
    ]
    for pat, sample in cases:
        rx, _ = compile_grok(pat)
        assert re.fullmatch(rx, sample), (pat, sample)


def test_single_pass_equals_naive_extraction(spark):
    """Property: the sentinel single-pass extraction must match a naive
    one-regexp_extract-per-field run for random word/int lines."""
    import random
    import re

    from pyspark.sql import functions as F

    from emf_spark.operators.grok import compile_grok

    rng = random.Random(13)
    words = ["alpha", "beta", "x9", "log", "Item_1", "z"]
    pattern = "%{WORD:w1} %{INT:n1:int} %{NOTSPACE:s1} %{GREEDYDATA:rest}"
    regex, fields = compile_grok(pattern)
    lines = []
    for _ in range(60):
        if rng.random() < 0.25:
            lines.append(" ".join(rng.choice(words) for _ in range(2)))  # unmatched
        else:
            lines.append(
                f"{rng.choice(words)} {rng.randrange(-50, 5000)} "
                f"{rng.choice(words)}#{rng.randrange(9)} "
                + " ".join(rng.choice(words) for _ in range(rng.randrange(0, 4)))
            )
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    got = {
        r["line"]: (r["w1"], r["n1"], r["s1"], r["rest"])
        for r in grok_extract(df, "line", pattern, drop_unmatched=False).collect()
    }
    for l in lines:
        m = re.search(regex, l)
        if m:
            expect = (m.group(1), int(m.group(2)), m.group(3), m.group(4))
        else:
            expect = ("", None, "", "")
        assert got[l] == expect, (l, got[l], expect)


def test_syslog5424_library_pattern(spark):
    from emf_spark.operators.grok import grok_extract

    line = (
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog '
        '1234 ID47 [exampleSDID@32473 iut="3"] An application event log entry'
    )
    df = spark.createDataFrame([(line,), ("not syslog",)], ["line"])
    rows = grok_extract(df, "line", "%{SYSLOG5424LINE}").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["syslog5424_pri"] == "<165>"
    assert r["syslog5424_host"] == "mymachine.example.com"
    assert r["syslog5424_app"] == "evntslog"
    assert r["syslog5424_proc"] == "1234"
    assert r["syslog5424_sd"] == '[exampleSDID@32473 iut="3"]'
    assert r["syslog5424_msg"] == "An application event log entry"


def test_httpd_errorlog_optional_client(spark):
    from emf_spark.operators.grok import grok_extract

    lines = [
        "[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] client denied",
        "[Wed Oct 11 14:32:53 2000] [notice] caught SIGTERM, shutting down",
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["line"])
    rows = {r["loglevel"]: r for r in
            grok_extract(df, "line", "%{HTTPD_ERRORLOG}").collect()}
    assert rows["error"]["clientip"] == "127.0.0.1"
    assert rows["notice"]["clientip"] == ""  # optional group -> empty
    assert rows["notice"]["message"] == "caught SIGTERM, shutting down"


def test_mine_templates_brute_force_parity(spark):
    """mine_templates() vs a pure-Python consensus on a hand corpus:
    digit pre-mask, (n_tokens, head) branching, per-position consensus
    wildcards, same-template group merge (n_groups), min_count filter,
    whitespace normalization, and blank-line drop."""
    import re
    from collections import defaultdict

    from emf_spark.operators.templates import mine_templates

    lines = [
        "INFO user u1 logged in",
        "INFO  user   u2 logged in",          # whitespace collapse
        "INFO user u3 logged out",            # consensus wildcard at pos 4
        "WARN disk sda1 nearly full",
        "WARN disk sdb2 nearly full",
        "ERROR code 500 on /api/x9",          # head ERROR
        "ERROR code 404 on /api/y7",
        "   ",                                # dropped
        "restart",                            # 1-token group
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["line"])

    groups = defaultdict(list)
    for l in lines:
        t = re.sub(r"\s+", " ", l.strip())
        if not t:
            continue
        ws = [("<*>" if re.search(r"[0-9]", w) else w)
              for w in t.split(" ")]
        groups[(len(ws), ws[0])].append(ws)
    want_counts: defaultdict = defaultdict(lambda: [0, 0])
    for (_n, _h), rows in groups.items():
        tmpl = " ".join(
            rows[0][p] if len({r[p] for r in rows}) == 1 else "<*>"
            for p in range(len(rows[0]))
        )
        want_counts[tmpl][0] += len(rows)
        want_counts[tmpl][1] += 1
    want = sorted(
        ((t, c, g) for t, (c, g) in want_counts.items()),
        key=lambda r: (-r[1], r[0]),
    )

    got = [(r["template"], r["n_lines"], r["n_groups"])
           for r in mine_templates(df).collect()]
    assert got == want
    assert ("INFO user <*> logged <*>", 3, 1) in got
    assert ("WARN disk <*> nearly full", 2, 1) in got
    assert ("ERROR code <*> on <*>", 2, 1) in got
    assert ("restart", 1, 1) in got

    # min_count filter
    got2 = [r["template"] for r in mine_templates(df, min_count=2).collect()]
    assert "restart" not in got2 and "INFO user <*> logged <*>" in got2

    with pytest.raises(ValueError):
        mine_templates(df, min_count=0)
