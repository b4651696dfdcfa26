"""Expression semantics tests — the VM-equivalence suite (vm/vm_test.go
style): table of (expression, expected) evaluated against the 1-row
context fixture, batched into single Spark jobs."""

import datetime

import pytest


class TestCoreSemantics:
    def test_arithmetic_and_comparison(self, evals):
        got = evals(
            [
                "int5 + 2",
                "int5 * 2.0",
                "int5 % 2",
                "int5 > 4",
                "int5 >= 5",
                "int5 == 5",
                "int5 != 5",
                "-int5",
            ]
        )
        assert got == [7, 10.0, 1, True, True, True, False, -5]

    def test_string_number_coercion(self, evals):
        # "5" == 5 coercions (vm/vm.go:350-366)
        got = evals(['int5 == "5"', 'item_count * 2', 'str5 > "4"'])
        assert got[0] is True
        assert got[1] == 10
        assert got[2] is True

    def test_between_exclusive(self, evals):
        # vm/vm.go:868 — EXCLUSIVE bounds
        got = evals(
            ["int5 BETWEEN 4 AND 6", "int5 BETWEEN 5 AND 6", "int5 BETWEEN 4 AND 5", "int5 NOT BETWEEN 4 AND 6"]
        )
        assert got == [True, False, False, False]

    def test_glob_like(self, evals):
        # vm/vm.go:1112-1126 — % AND * are wildcards
        got = evals(
            ['email LIKE "%bob%"', 'email LIKE "*@bob.com"', 'email LIKE "bob@%"', 'email NOT LIKE "%xyz%"', 'email LIKE "BOB%"']
        )
        assert got == [True, True, True, True, False]

    def test_null_and_exists_semantics(self, evals):
        # empty string counts as nil (value/value.go:510); != NULL is an
        # existence test (FIXTURES.md §5)
        got = evals(
            ["interests != NULL", "email != NULL", "EXISTS interests", "EXISTS email", "interests == NULL"]
        )
        assert got == [False, True, False, True, True]

    def test_in_variants(self, evals):
        got = evals(
            [
                "int5 IN (1, 5, 9)",
                "int5 IN (1, 2)",
                '"google.com" IN hits',  # string in map keys (vm/vm.go:535-546)
                'user_id IN ("abc", "def")',
                "int5 NOT IN (1, 2)",
            ]
        )
        assert got == [True, False, True, True, True]

    def test_contains(self, evals):
        got = evals(
            [
                'email CONTAINS "bob"',
                'email CONTAINS "xyz"',
                'urls CONTAINS "google"',  # element-substring on arrays (vm/vm.go:595-616)
                'urls NOT CONTAINS "yahoo"',
            ]
        )
        assert got == [True, False, True, True]

    def test_intersects(self, evals):
        got = evals(['["a", "b"] INTERSECTS ["b", "c"]', '["a"] INTERSECTS ["c"]'])
        assert got == [True, False]

    def test_boolean_logic(self, evals):
        got = evals(["bvalt AND bvalf", "bvalt OR bvalf", "NOT bvalf", "int5 > 1 && int5 < 10", "int5 > 9 || bvalt"])
        assert got == [False, True, True, True, True]

    def test_map_field_traversal(self, evals):
        # mt.event0 steps into map (vm/vm.go:777-789, README.md:73)
        got = evals(["hits.`google.com`", "hits.`google.com` > 2", "mt.event0 < mt.event1"])
        assert got == [5, True, True]

    def test_datemath(self, evals):
        # vm/datemath.go — "now-Nd" literals in time comparisons
        got = evals(['created < "now-1d"', 'created > "now-100y"', 'mt.event0 > "now-100y"'])
        assert got == [True, True, True]

    def test_permissive_date_literal(self, evals):
        got = evals(['created == "12/18/2015"', 'created >= "2015-12-01"'])
        assert got == [True, True]


class TestBuiltins:
    def test_strings(self, evals):
        got = evals(
            [
                "tolower(user_id)",
                'toupper("abc")',
                'string.titlecase("hello world")',
                'split("a,b,c", ",")',
                'string.index(email, "@")',
                "string.substr(email, 0, 3)",
                'strip("  x  ")',
                'replace(email, "bob", "rob")',
                'join("a", "b", "-")',
                'hasprefix(email, "bob")',
                'hassuffix(email, ".com")',
                "len(email)",
                "char_length(user_id)",
                'contains(email, "@")',
            ]
        )
        assert got == ["abc", "ABC", "Hello World", ["a", "b", "c"], 3, "bob", "x", "rob@rob.com", "a-b", True, True, 11, 3, True]

    def test_email_url(self, evals):
        got = evals(
            [
                "email(email)",
                "emailname(email)",
                "emaildomain(email)",
                "email(emailbad)",
                "host(urls.`0`)" if False else 'host("http://www.google.com/search?q=x")',
                'domain("http://www.sub.google.com/x")',
                'path("http://www.google.com/search?q=x")',
                'qs("http://www.google.com/search?q=golang", "q")',
                'urlminusqs("http://x.com/p?a=1&b=2", "a")',
                'urldecode("a%20b")',
            ]
        )
        assert got == [
            "bob@bob.com",
            "bob",
            "bob.com",
            None,
            "google.com",
            "google.com",
            "/search",
            "golang",
            "http://x.com/p?b=2",
            "a b",
        ]

    def test_hash_encode(self, evals):
        import hashlib

        got = evals(
            ["hash.md5(email)", "hash.sha1(email)", "hash.sha256(email)", 'encoding.b64encode("hi")', 'encoding.b64decode("aGk=")']
        )
        assert got[0] == hashlib.md5(b"bob@bob.com").hexdigest()
        assert got[1] == hashlib.sha1(b"bob@bob.com").hexdigest()
        assert got[2] == hashlib.sha256(b"bob@bob.com").hexdigest()
        assert got[3] == "aGk="
        assert got[4] == "hi"

    def test_time_funcs(self, evals):
        # created = 2015-12-18 (a Friday; Go weekday 5)
        got = evals(
            ["yy(created)", "mm(created)", "yymm(created)", "dayofweek(created)", "hourofday(created)", "totimestamp(created)", 'unixtrunc(created, "day")']
        )
        assert got[0] == 15
        assert got[1] == 12
        assert got[2] == "1512"
        assert got[3] == 5
        assert got[4] == 0
        assert got[5] == int(datetime.datetime(2015, 12, 18, tzinfo=datetime.timezone.utc).timestamp())
        assert got[6] == got[5]

    def test_extract_strftime(self, evals):
        got = evals(['extract(created, "%Y-%m")', 'strftime(created, "%d/%m/%y")'])
        assert got == ["2015-12", "18/12/15"]

    def test_casts(self, evals):
        got = evals(
            [
                "tostring(int5)",
                'toint("55")',
                'toint("$55.20")',  # permissive numeric cleanup (cast.go:137)
                'tonumber("$1,000.50")' if False else 'tonumber("1000.50")',
                'tobool("true")',
                "cast(int5 AS char)",
                "toint(created)",  # time → epoch millis (value/value.go:932)
            ]
        )
        assert got[0] == "5"
        assert got[1] == 55
        assert got[2] == 55
        assert got[3] == 1000.5
        assert got[4] is True
        assert got[5] == "5"
        assert got[6] == int(datetime.datetime(2015, 12, 18, tzinfo=datetime.timezone.utc).timestamp() * 1000)

    def test_logic_funcs(self, evals):
        got = evals(
            ["eq(int5, 5)", "ne(int5, 4)", "gt(int5, 4)", "le(int5, 5)", "not(bvalf)", "exists(email)", "exists(interests)", "any(interests, email)", "all(email, bvalt)", "all(email, bvalf)"]
        )
        assert got == [True, True, True, True, True, True, False, True, True, False]

    def test_selection_funcs(self, evals):
        got = evals(['oneof(interests, email, "default")', 'oneof(interests, "fallback")'])
        assert got == ["bob@bob.com", "fallback"]

    def test_array_map_funcs(self, evals):
        got = evals(
            ["array.index(urls, 0)", "array.slice(urls, 0, 1)", "mapkeys(hits)", "mapvalues(hits)", "len(urls)", "len(hits)"]
        )
        assert got[0] == "http://www.google.com/search?q=golang"
        assert got[1] == ["http://www.google.com/search?q=golang"]
        assert sorted(got[2]) == ["bing.com", "google.com"]
        assert sorted(got[3]) == [1, 5]
        assert got[4] == 2
        assert got[5] == 2

    def test_json(self, evals):
        got = evals(['json.jmespath(json_data, "name")', 'json.jmespath(json_data, "score")'])
        assert got == ["aaron", "42"]

    def test_math(self, evals):
        got = evals(["sqrt(25)", "pow(int5, 2)"])
        assert got == [5.0, 25.0]

    def test_useragent_stub(self, evals):
        got = evals(
            [
                'useragent("Mozilla/5.0 (Windows NT 10.0) Chrome/91.0", "ua_family")',
                'useragent("Mozilla/5.0 (Windows NT 10.0) Chrome/91.0", "os")',
                'useragent("Mozilla/5.0 (Windows NT 10.0) Chrome/91.0", "os_family")',
            ]
        )
        assert got == ["Chrome", "Windows 10", "Windows"]

    def test_custom_function_registration(self, spark, evals):
        # expr.FuncAdd parity (README.md:105-123)
        from pyspark.sql import functions as F

        from qlbridge_spark import func_add

        func_add("email_is_valid", lambda n, s: F.lower(_arg(n, s)).rlike(r"^[^@\s]+@[^@\s]+\.[^@\s]+$"))
        got = evals(["email_is_valid(email)", "email_is_valid(emailbad)"])
        assert got == [True, False]


def _arg(n, s):
    from qlbridge_spark import to_column

    return to_column(n.args[0], s)


class TestPipelineBuiltins:
    """SQL bridges to the datapipe text ops (superset builtins)."""

    @pytest.fixture(scope="class")
    def peng(self, spark):
        from qlbridge_spark import Engine

        eng = Engine(spark, "pipe_builtins")
        eng.register_df(
            "pdocs",
            spark.createDataFrame(
                [(1, "Hello WORLD write to bob@x.io or https://a.io from 10.0.0.1")],
                "id long, text string",
            ),
        )
        return eng

    def test_tokencount_modes(self, peng):
        r = peng.sql('SELECT tokencount(text) AS ws, tokencount(text, "bpe") AS b FROM pdocs').collect()[0]
        assert r["ws"] == 9 and r["b"] > r["ws"]

    def test_scrub_and_langid(self, peng):
        r = peng.sql('SELECT scrub(text) AS c, langid(text) AS lg, qualityscore(text) AS q FROM pdocs').collect()[0]
        assert "<EMAIL>" in r["c"] and "<URL>" in r["c"] and "<IP>" in r["c"]
        assert r["lg"] == "en" and 0.0 <= r["q"] <= 1.0

    def test_scrub_kind_selection(self, peng):
        r = peng.sql('SELECT scrub(text, "email") AS c FROM pdocs').collect()[0]
        assert "<EMAIL>" in r["c"] and "https://a.io" in r["c"]

    def test_bad_literal_errors(self, peng):
        from qlbridge_spark.translate import TranslateError

        with pytest.raises(TranslateError, match="string literal"):
            peng.sql("SELECT tokencount(text, id) AS x FROM pdocs").collect()


class TestAnsiPortabilityBatch:
    """Standard SQL function names (superset; absent from the reference's
    builtin registry expr/builtins/builtins.go) — all JVM-native."""

    def test_string_batch(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("ap", spark.createDataFrame([(1, "  hello world  ")], "n int, s string"))
        r = e.execute(
            'SELECT substring(s, 3, 5) AS sub, trim(s) AS t, ltrim(s) AS lt, rtrim(s) AS rt,'
            ' lpad(tostring(n), 3, "0") AS lp, repeat("ab", 2) AS rp, reverse("abc") AS rv,'
            ' left(trim(s), 5) AS lf, right(trim(s), 5) AS rg, instr("hello", "ll") AS ins,'
            ' initcap("foo bar") AS ic, ascii("A") AS asc, chr(66) AS ch,'
            " concat_ws('-', 'a', 'b') AS cw FROM ap"
        ).collect()[0]
        assert (r.sub, r.t, r.lp, r.rp, r.rv) == ("hello", "hello world", "001", "abab", "cba")
        assert (r.lf, r.rg, r.ins, r.ic, r.asc, r.ch, r.cw) == ("hello", "world", 3, "Foo Bar", 65, "B", "a-b")

    def test_math_batch(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("am", spark.createDataFrame([(-2.7,)], "x double"))
        r = e.execute(
            "SELECT sign(x) AS sg, trunc(x) AS t0, trunc(x * 10, 1) AS t1, mod(7, 3) AS m,"
            " round(ln(exp(1.0)), 9) AS one, round(log10(100.0), 9) AS two,"
            " round(log(2, 8.0), 9) AS three, round(degrees(pi()), 6) AS d,"
            " greatest(1, 5, 3) AS g, least(1, 5, 3) AS l, nullif(2, 2) AS nf,"
            " ifnull(NULL, 9) AS inn, try_divide(1, 0) AS td FROM am"
        ).collect()[0]
        assert (r.sg, r.t0, r.t1, r.m) == (-1.0, -2.0, -27.0, 1)
        assert (r.one, r.two, r.three, r.d) == (1.0, 2.0, 3.0, 180.0)
        assert (r.g, r.l, r.nf, r.inn, r.td) == (5, 1, None, 9, None)

    def test_agg_batch(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("ag", spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "n int, x double"))
        r = e.execute(
            "SELECT bool_and(n > 0) AS ba, bool_or(n > 2) AS bo, round(var_pop(n), 4) AS vp,"
            " round(var_samp(n), 4) AS vs, round(stddev_pop(n), 4) AS sp, round(corr(n, x), 4) AS cr,"
            " round(covar_samp(n, x), 4) AS cv, mode(n) AS md, array_agg(n) AS aa,"
            " string_agg(tostring(n), '|') AS sa FROM ag"
        ).collect()[0]
        assert (r.ba, r.bo) == (True, True)
        assert (r.vp, r.vs, r.sp, r.cr, r.cv) == (0.6667, 1.0, 0.8165, 1.0, 1.0)
        assert sorted(r.aa) == [1, 2, 3] and sorted(r.sa.split("|")) == ["1", "2", "3"]

    def test_variance_alias_and_every(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("av", spark.createDataFrame([(1,), (2,), (3,)], "n int"))
        r = e.execute("SELECT round(variance(n), 2) AS v, every(n < 10) AS ev FROM av").collect()[0]
        assert (r.v, r.ev) == (1.0, True)

    def test_ansi_extract(self, spark):
        import datetime

        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "ex", spark.createDataFrame([(datetime.datetime(2024, 3, 15, 10, 30, 45),)], "ts timestamp")
        )
        r = e.execute(
            "SELECT extract(year FROM ts) AS y, extract(quarter FROM ts) AS q,"
            " extract(dow FROM ts) AS dw, extract(isodow FROM ts) AS idw,"
            " extract(week FROM ts) AS wk, extract(epoch FROM ts) AS ep,"
            ' extract(ts, "%Y-%m") AS ref FROM ex'
        ).collect()[0]
        # DuckDB/Postgres numbering: 2024-03-15 is a Friday → dow 5, isodow 5
        assert (r.y, r.q, r.dw, r.idw, r.wk, r.ep, r.ref) == (2024, 1, 5, 5, 11, 1710498645, "2024-03")

    def test_extract_bad_part_errors(self, spark):
        from qlbridge_spark import Engine
        from qlbridge_spark.translate import TranslateError

        e = Engine(spark)
        e.register_df("ex2", spark.sql("SELECT current_timestamp() AS ts"))
        with pytest.raises((TranslateError, Exception), match="unsupported part"):
            e.execute("SELECT extract(fortnight FROM ts) FROM ex2").collect()

    def test_is_distinct_from(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "dt", spark.createDataFrame([(1, 1), (1, 2), (1, None), (None, None)], "a int, b int")
        )
        rows = e.execute(
            "SELECT a, b, a IS DISTINCT FROM b AS d, a IS NOT DISTINCT FROM b AS nd FROM dt"
        ).collect()
        got = {(r.a, r.b): (r.d, r.nd) for r in rows}
        # null-safe: never UNKNOWN (DuckDB/ANSI semantics)
        assert got == {
            (1, 1): (False, True),
            (1, 2): (True, False),
            (1, None): (True, False),
            (None, None): (False, True),
        }

    def test_is_distinct_from_in_where(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("dt2", spark.createDataFrame([(1, 1), (2, None)], "a int, b int"))
        rows = e.execute("SELECT a FROM dt2 WHERE a IS DISTINCT FROM b").collect()
        assert [r.a for r in rows] == [2]

    def test_interval_literals(self, spark):
        import datetime

        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "iv", spark.createDataFrame([(datetime.datetime(2024, 3, 15, 10, 30, 45),)], "ts timestamp")
        )
        r = e.execute(
            "SELECT ts + INTERVAL 3 DAY AS d3, ts - INTERVAL '2 hours' AS h2,"
            " ts + INTERVAL 1 month AS m1, ts + INTERVAL 500 millisecond AS ms FROM iv"
        ).collect()[0]
        assert r.d3 == datetime.datetime(2024, 3, 18, 10, 30, 45)
        assert r.h2 == datetime.datetime(2024, 3, 15, 8, 30, 45)
        assert r.m1 == datetime.datetime(2024, 4, 15, 10, 30, 45)
        assert r.ms == datetime.datetime(2024, 3, 15, 10, 30, 45, 500000)

    def test_interval_in_where(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("iv2", spark.sql("SELECT current_timestamp() AS ts"))
        assert e.execute("SELECT 1 AS x FROM iv2 WHERE ts > now() - INTERVAL 1 day").count() == 1

    def test_interval_bad_unit_errors(self, spark):
        from qlbridge_spark import Engine
        from qlbridge_spark.translate import TranslateError

        e = Engine(spark)
        e.register_df("iv3", spark.sql("SELECT current_timestamp() AS ts"))
        with pytest.raises((TranslateError, Exception), match="unsupported unit"):
            e.execute("SELECT ts + INTERVAL 2 fortnight FROM iv3").collect()

    def test_ordered_set_aggregates(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "osa",
            spark.createDataFrame(
                [("a", 3, "z"), ("a", 1, "x"), ("a", 2, "y"), ("b", 5, "q")], "g string, n int, s string"
            ),
        )
        rows = e.execute(
            "SELECT g, string_agg(s, ',' ORDER BY n) AS a, string_agg(s, ',' ORDER BY n DESC) AS d,"
            " array_agg(n ORDER BY s DESC) AS r FROM osa GROUP BY g ORDER BY g"
        ).collect()
        # DuckDB-matched deterministic ordering
        assert [(r.g, r.a, r.d, r.r) for r in rows] == [("a", "x,y,z", "z,y,x", [3, 2, 1]), ("b", "q", "q", [5])]

    def test_agg_order_on_plain_agg_errors(self, spark):
        from qlbridge_spark import Engine
        from qlbridge_spark.translate import TranslateError

        e = Engine(spark)
        e.register_df("osa2", spark.createDataFrame([(1,)], "n int"))
        with pytest.raises((TranslateError, Exception), match="ordered-set"):
            e.execute("SELECT sum(n ORDER BY n) FROM osa2").collect()

    def test_mixed_direction_errors(self, spark):
        from qlbridge_spark import Engine
        from qlbridge_spark.translate import TranslateError

        e = Engine(spark)
        e.register_df("osa3", spark.createDataFrame([(1, 2)], "a int, b int"))
        with pytest.raises((TranslateError, Exception), match="one direction"):
            e.execute("SELECT string_agg(tostring(a), ',' ORDER BY a ASC, b DESC) FROM osa3").collect()

    def test_bracket_indexing(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "bi",
            spark.createDataFrame(
                [(1, ["a", "b", "c"], {"k": 7})], "id int, arr array<string>, m map<string,int>"
            ),
        )
        r = e.execute(
            "SELECT arr[1] AS f, arr[-1] AS l, arr[9] AS oob, m['k'] AS mk, m['z'] AS mz,"
            " split('x,y', ',')[2] AS fn FROM bi"
        ).collect()[0]
        # DuckDB semantics: 1-based, negative from the end, out-of-range NULL
        assert (r.f, r.l, r.oob, r.mk, r.mz, r.fn) == ("a", "c", None, 7, None, "y")

    def test_bracket_on_array_literal(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("bi2", spark.createDataFrame([(1,)], "id int"))
        assert e.execute("SELECT [10, 20, 30][2] AS x FROM bi2").collect()[0].x == 20

    def test_try_cast(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("tc", spark.createDataFrame([("12",), ("oops",)], "s string"))
        rows = e.execute("SELECT s, try_cast(s AS int) AS n FROM tc ORDER BY s").collect()
        assert [(r.s, r.n) for r in rows] == [("12", 12), ("oops", None)]

    def test_ansi_date_batch(self, spark):
        import datetime

        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "adb", spark.createDataFrame([(datetime.datetime(2024, 3, 15, 10, 30),)], "ts timestamp")
        )
        r = e.execute(
            "SELECT date_trunc('month', ts) AS mo, date_add(ts, 10) AS p10,"
            " datediff('2024-03-20', ts) AS dd, last_day(ts) AS ld, add_months(ts, 2) AS am,"
            " round(months_between('2024-05-15', ts), 4) AS mb, make_date(2024, 2, 29) AS md,"
            " to_date(ts) AS d, date_part('year', ts) AS y FROM adb"
        ).collect()[0]
        assert r.mo == datetime.datetime(2024, 3, 1)
        assert r.p10 == datetime.date(2024, 3, 25)
        assert (r.dd, r.ld, r.am) == (5, datetime.date(2024, 3, 31), datetime.date(2024, 5, 15))
        assert (r.mb, r.md, r.d, r.y) == (2.0, datetime.date(2024, 2, 29), datetime.date(2024, 3, 15), 2024)

    def test_current_date_functions(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("cdf", spark.range(1).toDF("n"))
        r = e.execute(
            "SELECT current_date() AS d, current_timestamp() AS ts, today() AS t FROM cdf"
        ).collect()[0]
        assert r.d == r.t and r.ts is not None

    def test_array_regex_json_batch(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "arj",
            spark.createDataFrame(
                [(1, ["c", "a", "b"], '{"k": {"v": 5}}', "hello")],
                "id int, arr array<string>, js string, s string",
            ),
        )
        r = e.execute(
            "SELECT array_contains(arr, 'a') AS hasa, array_length(arr) AS n,"
            " array_sort(arr) AS srt, array_position(arr, 'b') AS pos,"
            " slice(array_sort(arr), 2, 2) AS sl, regexp_matches(s, 'ell') AS rm,"
            " regexp_replace(s, 'l+', 'L') AS rr, regexp_extract(s, 'h(e.)', 1) AS re,"
            " starts_with(s, 'he') AS sw, ends_with(s, 'lo') AS ew, strpos(s, 'llo') AS sp,"
            " printf('%s-%d', s, id) AS pf, json_extract(js, '$.k.v') AS jx FROM arj"
        ).collect()[0]
        assert (r.hasa, r.n, r.srt, r.pos) == (True, 3, ["a", "b", "c"], 3)
        assert (r.sl, r.rm, r.rr, r.re) == (["b", "c"], True, "heLo", "el")
        assert (r.sw, r.ew, r.sp, r.pf, r.jx) == (True, True, 3, "hello-1", "5")

    def test_higher_order_lambdas(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "hof", spark.createDataFrame([(2, [1, 2, 3], [10, 20, 30])], "k int, a array<int>, b array<int>")
        )
        r = e.execute(
            "SELECT transform(a, x -> x * k) AS sc, list_filter(a, x -> x % 2 = 1) AS od,"
            " aggregate(a, 0, (acc, x) -> acc + x) AS tot, zip_with(a, b, (x, y) -> x + y) AS z,"
            " forall(a, x -> x > 0) AS ap, array_exists(a, x -> x = 2) AS h2,"
            " list_transform(a, x -> x + 100) AS lt FROM hof"
        ).collect()[0]
        # closure over the outer column k works (Catalyst LambdaFunction)
        assert (r.sc, r.od, r.tot) == ([2, 4, 6], [1, 3], 6)
        assert (r.z, r.ap, r.h2, r.lt) == ([11, 22, 33], True, True, [101, 102, 103])

    def test_lambda_plan_is_jvm_only(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("hof2", spark.createDataFrame([([1, 2],)], "a array<int>"))
        plan = e.execute("SELECT transform(a, x -> x + 1) AS t FROM hof2")._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan

    def test_lambda_outside_hof_errors(self, spark):
        from qlbridge_spark import Engine
        from qlbridge_spark.translate import TranslateError

        e = Engine(spark)
        e.register_df("hof3", spark.createDataFrame([([1],)], "a array<int>"))
        with pytest.raises((TranslateError, Exception), match="lambda"):
            e.execute("SELECT coalesce(a, x -> x) FROM hof3").collect()

    def test_ilike(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("il", spark.createDataFrame([("Alpha",), ("BETA",), ("gamma",)], "s string"))
        assert [r.s for r in e.execute("SELECT s FROM il WHERE s ILIKE '%a%' ORDER BY s").collect()] == [
            "Alpha", "BETA", "gamma"
        ]
        assert [r.s for r in e.execute("SELECT s FROM il WHERE s NOT ILIKE 'b%' ORDER BY s").collect()] == [
            "Alpha", "gamma"
        ]
        # column pattern, both sides lowered
        e.register_df("il2", spark.createDataFrame([("Alpha", "AL%")], "s string, p string"))
        assert e.execute("SELECT s FROM il2 WHERE s ILIKE p").count() == 1

    def test_struct_to_json_export(self, spark):
        # the parquet→JSONL export op; compact format matches DuckDB's
        # to_json(struct_pack(...)) exactly for int/string fields
        import duckdb

        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("je", spark.createDataFrame([(1, "hello")], "id int, text string"))
        line = e.execute(
            "SELECT to_json(named_struct('id', id, 'text', text)) AS line FROM je"
        ).collect()[0].line
        duck = duckdb.sql("SELECT to_json(struct_pack(id := 1, text := 'hello'))").fetchone()[0]
        assert line == duck == '{"id":1,"text":"hello"}'

    def test_struct_field_names(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df("sf", spark.createDataFrame([(1, 2)], "a int, b int"))
        df = e.execute("SELECT struct(a, b) AS s, struct(a + 1) AS t FROM sf")
        assert df.schema["s"].dataType.fieldNames() == ["a", "b"]
        assert df.schema["t"].dataType.fieldNames() == ["col0"]


class TestVarianceDistinct:
    def test_variance_family_distinct(self, spark):
        from qlbridge_spark import Engine

        e = Engine(spark)
        e.register_df(
            "vd",
            spark.createDataFrame(
                [(1, 1.0), (2, 1.0), (3, 2.0), (4, 5.0), (5, None)],
                "id int, x double",
            ),
        )
        r = e.execute(
            "SELECT round(var_samp(DISTINCT x), 6) AS vs, round(var_pop(DISTINCT x), 6) AS vp,"
            " round(stddev(DISTINCT x), 6) AS sd, round(stddev_pop(DISTINCT x), 6) AS sp"
            " FROM vd"
        ).collect()[0]
        # distinct values {1, 2, 5}: mean 8/3, m2 = 26/3
        assert r.vs == round(26 / 3 / 2, 6) and r.vp == round(26 / 9, 6)
        assert r.sd == round((26 / 6) ** 0.5, 6) and r.sp == round((26 / 9) ** 0.5, 6)

    def test_distinct_variance_large_magnitude(self, spark):
        # centered sums: epoch-millis magnitude must not collapse to 0
        from qlbridge_spark import Engine

        e = Engine(spark)
        T0 = 1.755e12
        e.register_df(
            "vm",
            spark.createDataFrame(
                [(1, T0 + 1.0), (2, T0 + 1.0), (3, T0 + 3.0)], "id int, x double"
            ),
        )
        r = e.execute("SELECT var_samp(DISTINCT x) AS vs FROM vm").collect()[0]
        assert abs(r.vs - 2.0) < 1e-6  # distinct {T0+1, T0+3}
