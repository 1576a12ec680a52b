"""User-agent classification (operators/useragent.py)."""

from pyspark.sql import functions as F

from emf_spark.operators.useragent import parse_user_agent


def _parse(spark, ua):
    df = spark.createDataFrame([(ua,)], "ua string")
    row = df.select(parse_user_agent(F.col("ua")).alias("p")).collect()[0]["p"]
    return None if row is None else row.asDict()


CHROME_WIN = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36"
)


def test_order_is_load_bearing(spark):
    # Edge and Opera UAs CONTAIN Chrome/; Chrome UAs contain Safari —
    # the specific token must win over the generic one it embeds.
    edge = _parse(spark, CHROME_WIN + " Edg/124.0.1")
    assert (edge["family"], edge["version"], edge["major"]) == ("edge", "124.0.1", 124)
    opera = _parse(spark, CHROME_WIN + " OPR/110.0.0.0")
    assert opera["family"] == "opera"
    chrome = _parse(spark, CHROME_WIN)
    assert (chrome["family"], chrome["major"]) == ("chrome", 124)
    assert (chrome["os"], chrome["os_version"]) == ("windows", "10.0")
    assert (chrome["device"], chrome["is_bot"]) == ("desktop", False)


def test_safari_version_token_and_ios_underscores(spark):
    p = _parse(
        spark,
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_5 like Mac OS X) "
        "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.5 "
        "Mobile/15E148 Safari/604.1",
    )
    # Safari versions come from Version/x, not Safari/x
    assert (p["family"], p["version"]) == ("safari", "17.5")
    # iOS beats macos (UA also says 'like Mac OS X'); 17_5 -> 17.5
    assert (p["os"], p["os_version"]) == ("ios", "17.5")
    assert p["device"] == "mobile"


def test_android_tablet_vs_mobile_and_linux_precedence(spark):
    phone = _parse(
        spark,
        "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/124.0.0.0 Mobile Safari/537.36",
    )
    # android token beats the generic linux it rides with
    assert (phone["os"], phone["os_version"]) == ("android", "14")
    assert phone["device"] == "mobile"
    tablet = _parse(
        spark,
        "Mozilla/5.0 (Linux; Android 14; SM-X910) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    )
    # the Android convention: no 'Mobile' token => tablet
    assert tablet["device"] == "tablet"


def test_bot_curl_ie_other_and_null(spark):
    bot = _parse(spark, "Googlebot/2.1 (+http://www.google.com/bot.html)")
    assert (bot["family"], bot["device"], bot["is_bot"]) == ("bot", "bot", True)
    assert bot["version"] is None and bot["major"] is None
    assert _parse(spark, "curl/8.5.0")["is_bot"] is True
    ie = _parse(
        spark, "Mozilla/5.0 (compatible; MSIE 9.0; Windows NT 6.1; Trident/5.0)"
    )
    assert (ie["family"], ie["version"], ie["os_version"]) == ("ie", "9.0", "6.1")
    other = _parse(spark, "TotallyUnknownAgent")
    assert (other["family"], other["version"], other["os"]) == ("other", None, "other")
    assert _parse(spark, None) is None


def test_firefox_rv_ipad_and_macos(spark):
    ff = _parse(
        spark,
        "Mozilla/5.0 (X11; Linux x86_64; rv:125.0) Gecko/20100101 Firefox/125.0",
    )
    assert (ff["family"], ff["version"], ff["os"]) == ("firefox", "125.0", "linux")
    assert ff["os_version"] is None
    ipad = _parse(
        spark,
        "Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1",
    )
    assert (ipad["os"], ipad["device"]) == ("ios", "tablet")
    mac = _parse(
        spark,
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/17.4.1 Safari/605.1.15",
    )
    assert (mac["os"], mac["os_version"]) == ("macos", "10_15_7")
    assert mac["device"] == "desktop"


def test_plan_is_one_narrow_projection(spark):
    # the whole classifier must fold into the scan's projection: no
    # exchange, no python, no join — it costs only the pass it rides on
    df = spark.createDataFrame([(CHROME_WIN,)], "ua string").select(
        parse_user_agent(F.col("ua")).alias("p")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Python", "Join", "Generate"):
        assert bad not in plan, plan
