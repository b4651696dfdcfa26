"""useragent() over the vendored uap-core regex subset
(qlbridge_spark/functions/uaparse.py).

The fixture is 20 real-world UA strings with their uap-core
family/OS-family labels (recorded from the public ua-parser/uap-core
project's reference behavior for these households-name UAs). Both
evaluation paths must agree: the JVM Column chain (useragent() in SQL) and
the row-eval python path (pyeval) — the reference evaluates the same
builtin tuple-at-a-time in its vm (url_email.go:694)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qlbridge_spark.functions import uaparse

# (ua, family, os_family, browser_version_prefix, mobile)
FIXTURE = [
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Chrome", "Windows", "120", "false",
    ),
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
        "Edge", "Windows", "120", "false",
    ),
    (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
        "Safari", "Mac OS X", "17", "false",
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
        "Mobile Safari", "iOS", "17", "true",
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
        "Chrome Mobile iOS", "iOS", "120", "true",
    ),
    (
        "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36",
        "Chrome Mobile", "Android", "120", "true",
    ),
    (
        "Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
        "Samsung Internet", "Android", "23", "true",
    ),
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",
        "Opera", "Windows", "105", "false",
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/120.0 Mobile/15E148 Safari/605.1.15",
        "Firefox iOS", "iOS", "120", "true",
    ),
    (
        "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
        "Firefox", "Linux", "121", "false",
    ),
    (
        "Mozilla/5.0 (compatible; MSIE 9.0; Windows NT 6.1; Trident/5.0)",
        "IE", "Windows", "9", "false",
    ),
    (
        "Mozilla/5.0 (Windows NT 6.3; Trident/7.0; rv:11.0) like Gecko",
        "IE", "Windows", "11", "false",
    ),
    (
        "Mozilla/5.0 (Linux; Android 10; K) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/114.0.0.0 YaBrowser/23.7.5.60 Mobile Safari/537.36",
        "Yandex Browser", "Android", "23", "true",
    ),
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Vivaldi/6.5.3206.48",
        "Vivaldi", "Windows", "6", "false",
    ),
    (
        "Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Chrome", "Chrome OS", "120", "false",
    ),
    (
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) HeadlessChrome/119.0.6045.105 Safari/537.36",
        "HeadlessChrome", "Linux", "119", "false",
    ),
    (
        "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
        "Googlebot", "Other", "2", "false",
    ),
    ("curl/8.4.0", "curl", "Other", "8", "false"),
    ("python-requests/2.31.0", "Python Requests", "Other", "2", "false"),
    (
        "Mozilla/5.0 (Linux; Android 14; wv) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/120.0.6099.144 Mobile Safari/537.36",
        "Chrome Mobile WebView", "Android", "120", "true",
    ),
]


class TestUaCoreSubsetPython:
    @pytest.mark.parametrize("ua,fam,osf,vmaj,mobile", FIXTURE, ids=[f[1] for f in FIXTURE])
    def test_family_os_version_mobile(self, ua, fam, osf, vmaj, mobile):
        assert uaparse.parse_part(ua, "browser") == fam
        assert uaparse.parse_part(ua, "os_family") == osf
        assert uaparse.parse_part(ua, "browser_version").split(".")[0] == vmaj
        assert uaparse.parse_part(ua, "mobile") == mobile

    def test_bot_flags(self):
        assert uaparse.parse_part(FIXTURE[16][0], "bot") == "true"  # Googlebot
        assert uaparse.parse_part(FIXTURE[17][0], "bot") == "true"  # curl
        assert uaparse.parse_part(FIXTURE[0][0], "bot") == "false"  # Chrome

    def test_engine_platform_mozilla(self):
        chrome = FIXTURE[0][0]
        assert uaparse.parse_part(chrome, "engine") == "AppleWebKit"
        assert uaparse.parse_part(chrome, "engine_version").startswith("537.36")
        assert uaparse.parse_part(chrome, "platform") == "Windows NT 10.0"
        assert uaparse.parse_part(chrome, "mozilla") == "5.0"
        ff = FIXTURE[9][0]
        assert uaparse.parse_part(ff, "engine") == "Gecko"

    def test_os_raw_go_lib_style(self):
        """os (and its alias os_raw): the raw comment token in the style
        of the Go lib the reference wraps (ua.OS(), url_email.go:766) —
        Windows NT → marketing name, underscores → dots. The uap-core
        family moved to 'os_family' (r16 default-parity flip)."""
        assert uaparse.parse_part(FIXTURE[0][0], "os") == "Windows 10"
        assert uaparse.parse_part(FIXTURE[0][0], "os_raw") == "Windows 10"
        mac = "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15"
        assert uaparse.parse_part(mac, "os_raw") == "Intel Mac OS X 10.15.7"
        ios = "Mozilla/5.0 (iPhone; CPU iPhone OS 14_2 like Mac OS X) AppleWebKit/605.1.15"
        assert uaparse.parse_part(ios, "os_raw") == "CPU iPhone OS 14.2 like Mac OS X"
        android = "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36"
        assert uaparse.parse_part(android, "os_raw") == "Android 14"
        linux = "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"
        assert uaparse.parse_part(linux, "os_raw") == "Linux x86_64"
        # the documented Go-lib example output (url_email.go:729)
        assert uaparse.parse_part(linux, "os") == "Linux x86_64"
        win7 = "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36"
        assert uaparse.parse_part(win7, "os_raw") == "Windows 7"
        assert uaparse.parse_part("curl/8.4.0", "os_raw") == ""


class TestUaCoreSubsetColumn:
    def test_column_path_matches_python_path(self, spark):
        """The JVM when/rlike chain and the python row-eval must produce
        identical output over the whole fixture for every part."""
        df = spark.createDataFrame([(ua,) for ua, *_ in FIXTURE], "ua string")
        parts = list(uaparse.PARTS)
        cols = [uaparse.part_col(F.col("ua"), p).alias(p) for p in parts]
        got = df.select("ua", *cols).collect()
        for row in got:
            for p in parts:
                assert row[p] == uaparse.parse_part(row["ua"], p), (p, row["ua"])

    def test_sql_surface(self, engine):
        rows = engine.sql(
            'SELECT useragent("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 '
            '(KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36", "browser") AS fam, '
            'useragent("curl/8.4.0", "bot") AS bot FROM users LIMIT 1'
        ).collect()
        assert rows[0]["fam"] == "Chrome Mobile"
        assert rows[0]["bot"] == "true"

    def test_no_python_udf_in_plan(self, spark, engine):
        df = engine.sql('SELECT useragent(email, "browser") AS f FROM users')
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
