"""Source connectors (JSON, multi-table config) and the long tail of
builtin functions not covered elsewhere."""

import pytest


class TestSources:
    def test_sources_json(self, engine, tmp_path):
        p = tmp_path / "data.jsonl"
        p.write_text('{"name": "rex", "age": 3}\n{"name": "fido", "age": 5}\n')
        engine.execute(f'CREATE SOURCE pets_json WITH {{"type": "json", "path": "{p}"}}')
        out = engine.sql("SELECT name FROM pets_json WHERE age > 4").collect()
        assert [r[0] for r in out] == ["fido"]
        engine.execute("DROP SOURCE pets_json")

    def test_sources_multi_table(self, engine, tmp_path):
        # cloud-files-style source: one config, many tables
        (tmp_path / "a.csv").write_text("x\n1\n2\n")
        (tmp_path / "b.csv").write_text("y\n9\n")
        cfg = f'{{"type": "csv", "tables": {{"ta": "{tmp_path}/a.csv", "tb": "{tmp_path}/b.csv"}}}}'
        engine.execute(f"CREATE SOURCE files WITH {cfg}")
        assert engine.sql("SELECT count(*) AS n FROM ta").collect()[0][0] == 2
        assert engine.sql("SELECT count(*) AS n FROM tb").collect()[0][0] == 1
        engine.execute("DROP TABLE ta")
        engine.execute("DROP TABLE tb")

    def test_gzip_csv(self, engine, tmp_path):
        import gzip

        p = tmp_path / "z.csv.gz"
        with gzip.open(p, "wt") as f:
            f.write("a,b\n1,x\n2,y\n")
        engine.execute(f'CREATE SOURCE gz WITH {{"type": "csv", "path": "{p}"}}')
        assert engine.sql("SELECT count(*) AS n FROM gz").collect()[0][0] == 2
        engine.execute("DROP SOURCE gz")


class TestBuiltinLongTail:
    def test_time_tail(self, evals):
        got = evals(
            [
                "monthofyear(created)",
                "hourofweek(created)",  # Friday (Go dow 5) * 24 + 0
                'seconds("90")',
                'seconds("1:30")',
                'seconds("1:01:30")',
                'unixtrunc(created, "month")',
                'todatein("2015-12-18", "America/Los_Angeles")',
            ]
        )
        assert got[0] == 12
        assert got[1] == 5 * 24
        assert got[2] == 90.0
        assert got[3] == 90.0
        assert got[4] == 3690.0
        import datetime

        assert got[5] == int(datetime.datetime(2015, 12, 1, tzinfo=datetime.timezone.utc).timestamp())
        # LA is UTC-8 in December: midnight LA = 08:00 UTC
        assert got[6].hour == 8

    def test_map_tail(self, evals):
        got = evals(['map("k", 5)', 'maptime("k")', "mapinvert(hits)"])
        assert got[0] == {"k": 5}
        assert list(got[1].keys()) == ["k"]
        assert got[2] == {"5": "google.com", "1": "bing.com"}

    def test_match_prefix_fields(self, evals):
        # match("int") → map of fields whose name starts with "int",
        # prefix stripped (list_map.go:292)
        got = evals(['match("int")'])
        # matches int5 AND interests (both start with "int"), prefix stripped
        assert got[0] == {"5": "5", "erests": ""}

    def test_url_tail(self, evals):
        got = evals(
            [
                'urlmain("http://www.site.com/path/x?a=1")',
                'url.matchqs("http://x.com/?q=5", "q")',
                'url.matchqs("http://x.com/?q=5", "zz")',
                'qsl("http://x.com/?q=5", "q")',
                'hosts(urls)',
                'domains(urls)',
            ]
        )
        assert got[0] == "www.site.com/path/x"
        assert got[1] is True and got[2] is False
        assert got[3] == ["5"]
        assert sorted(got[4]) == ["google.com", "nytimes.com"]
        assert sorted(got[5]) == ["google.com", "nytimes.com"]

    def test_hash_tail(self, evals):
        import hashlib

        got = evals(["hash.sha512(email)", "hash(email)", "hash.sip(email)", "unsign(-5)"])
        assert got[0] == hashlib.sha512(b"bob@bob.com").hexdigest()
        assert isinstance(got[1], int) and got[1] == got[2]
        assert got[3] == 5

    def test_uuid_and_misc(self, evals):
        got = evals(["uuid()", 'concat("a", 1, "b")', "abs(0 - 5)", "round(3.456, 1)"])
        import uuid as uuid_mod

        uuid_mod.UUID(got[0])  # parses as a UUID
        assert got[1] == "a1b"
        assert got[2] == 5
        assert got[3] == 3.5

    def test_filter_funcs_on_maps(self, evals):
        got = evals(['filtermatch(hits, "goo*")', 'filter(hits, "goo*")'])
        assert got[0] == {"google.com": 5}
        assert got[1] == {"bing.com": 1}

    def test_useragent_map(self, evals):
        got = evals(['useragent.map("Mozilla/5.0 (X11; Linux x86_64) Firefox/89.0")'])
        assert got[0]["ua_family"] == "Firefox"
        assert got[0]["os_family"] == "Linux"

    def test_todate_two_arg_layout(self, evals):
        # todate("01/02/2006", col) — Go layout (time.go:307)
        got = evals(['todate("01/02/2006", "12/18/2015")'])
        assert got[0].year == 2015 and got[0].month == 12 and got[0].day == 18
