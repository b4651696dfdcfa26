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

    def test_sources_orc(self, engine, spark, tmp_path):
        p = str(tmp_path / "pets_orc")
        spark.createDataFrame([("rex", 3), ("fido", 5)], "name string, age int").write.orc(p)
        engine.execute(f'CREATE SOURCE pets_orc WITH {{"type": "orc", "path": "{p}"}}')
        out = engine.sql("SELECT name FROM pets_orc WHERE age > 4").collect()
        assert [r[0] for r in out] == ["fido"]
        engine.execute("DROP SOURCE pets_orc")

    def test_sources_text(self, engine, tmp_path):
        p = tmp_path / "corpus.txt"
        p.write_text("the quick brown fox\nhello world\n")
        engine.execute(f'CREATE SOURCE corpus WITH {{"type": "text", "path": "{p}"}}')
        out = engine.sql('SELECT value FROM corpus WHERE value LIKE "hello*"').collect()
        assert [r[0] for r in out] == ["hello world"]
        engine.execute("DROP SOURCE corpus")

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

        from qlbridge_spark.functions.sip import siphash24_i64

        got = evals(["hash.sha512(email)", "hash(email)", "hash.sip(email)", "unsign(-5)", "hash.xx64(email)"])
        assert got[0] == hashlib.sha512(b"bob@bob.com").hexdigest()
        # hash/hash.sip are EXACT SipHash-2-4 key (0,1) — the reference's
        # hashSipEval (hash_and_encode.go:25) bit-for-bit
        assert got[1] == got[2] == siphash24_i64(0, 1, b"bob@bob.com")
        assert got[3] == 5
        assert isinstance(got[4], int)  # xx64 fast path stays available

    def test_hash_array_input_and_empty_array(self, evals):
        from qlbridge_spark.functions.sip import siphash24_i64

        # slice input hashes the FIRST element (hash_and_encode.go);
        # an empty array is per-row not-ok (None), not a query error
        got = evals(['hash(split(email, "@"))', 'hash(split("", ","))'])
        assert got[0] == siphash24_i64(0, 1, b"bob")
        assert got[1] is None

    def test_siphash_paper_vectors(self):
        # official SipHash-2-4 test vectors (Aumasson & Bernstein, appendix
        # A: key 000102..0f, messages 00,01,..): vectors[i] = Sip-2-4 of
        # the first i message bytes
        from qlbridge_spark.functions.sip import siphash24

        k0 = 0x0706050403020100
        k1 = 0x0F0E0D0C0B0A0908
        msg = bytes(range(64))
        expected = {
            0: 0x726FDB47DD0E0E31,
            1: 0x74F839C593DC67FD,
            8: 0x93F5F5799A932462,
            15: 0xA129CA6149BE45E5,
            # the paper prints vectors as byte arrays; as little-endian
            # uint64 the 63-byte vector (72 45 06 eb 4c 32 8a 95) is:
            63: 0x958A324CEB064572,
        }
        for n, want in expected.items():
            assert siphash24(k0, k1, msg[:n]) == want, f"vector {n}"

    def test_siphash_partitioner_key(self):
        # the reference's file/index partitioner key (456729, 1111581582)
        # — datasource/files/filesource.go:49 — must be expressible too
        from qlbridge_spark.functions.sip import siphash24

        h1 = siphash24(456729, 1111581582, b"part-00000.csv")
        h2 = siphash24(456729, 1111581582, b"part-00001.csv")
        assert h1 != h2 and 0 <= h1 < (1 << 64)

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


class TestSqliteSource:
    """Parity with the reference's sqlite golden suite
    (/root/reference/datasource/sqlite/source.go:20-49,
    testutil/suite_test.go:7): build a .db file, register it as a source,
    run the standard query shapes against it."""

    @pytest.fixture()
    def db_file(self, tmp_path):
        import sqlite3

        p = str(tmp_path / "users.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE users (user_id TEXT, name TEXT, deleted INTEGER, reg_yy INTEGER, balance REAL)")
        con.executemany(
            "INSERT INTO users VALUES (?,?,?,?,?)",
            [
                ("u1", "Aaron", 0, 12, 100.5),
                ("u2", "Bob", 1, 13, 50.0),
                ("u3", "Carol", 0, 12, 75.25),
            ],
        )
        con.commit()
        con.close()
        return p

    def test_scan_filter_agg(self, engine, db_file):
        engine.execute(f'CREATE SOURCE sq WITH {{"type": "sqlite", "file": "{db_file}", "dbtable": "users"}}')
        rows = engine.sql('SELECT name FROM sq WHERE deleted = 0 ORDER BY name').collect()
        assert [r["name"] for r in rows] == ["Aaron", "Carol"]
        agg = engine.sql('SELECT reg_yy, count(*) AS n, round(sum(balance), 2) AS bal FROM sq GROUP BY reg_yy ORDER BY reg_yy').collect()
        assert [(r["reg_yy"], r["n"], r["bal"]) for r in agg] == [(12, 2, 175.75), (13, 1, 50.0)]

    def test_query_mode_and_empty_table(self, spark, tmp_path, db_file):
        import sqlite3

        from qlbridge_spark.sources import load_source

        out = load_source(spark, {"type": "sqlite", "file": db_file, "query": "SELECT user_id FROM users WHERE balance > 60", "table": "rich"})
        assert sorted(r["user_id"] for r in out["rich"].collect()) == ["u1", "u3"]

        p = str(tmp_path / "empty.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (a INTEGER, b TEXT)")
        con.commit()
        con.close()
        df = load_source(spark, {"type": "sqlite", "file": p, "dbtable": "t"})["t"]
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["a", "b"]


class TestRegexOperator:
    def test_expression_paths_agree(self, spark):
        from qlbridge_spark.exprparse import parse_expression
        from qlbridge_spark.pyeval import PyScope, py_eval
        from qlbridge_spark.translate import Scope, to_column

        ctx = {"name": "stats.cpu.load", "n": 5}
        cases = [
            ('name =~ "^stats\\\\."', True),
            ('name =~ "/^STATS\\\\./i"', True),
            ('name !~ "mem"', True),
            ('name =~ "mem"', False),
            ('missing =~ "x"', None),
        ]
        df = spark.createDataFrame([ctx])
        for expr, want in cases:
            node = parse_expression(expr)
            assert py_eval(node, PyScope(ctx)) is want, expr
            got = df.select(to_column(node, Scope({"_": df}, strict=False)).alias("v")).collect()[0][0]
            assert got is want, f"spark path: {expr}"

    def test_filterql_and_sql(self, engine):
        matched = engine.execute('FILTER email =~ "/^[a-z]+@email\\\\.com$/" FROM users')
        assert sorted(r["user_id"] for r in matched.collect()) == ["9Ip1aKbeZe2njCDM", "hT2impsOPUREcVPc"]
        rows = engine.sql('SELECT user_id FROM users WHERE user_id =~ "^hT2" ORDER BY user_id').collect()
        assert [r["user_id"] for r in rows] == ["hT2impsOPUREcVPc", "hT2impsabc345c"]

    def test_vm_matches_regex(self):
        from qlbridge_spark import vm

        assert vm.matches(None, {"path": "stats.cpu"}, 'FILTER path =~ "^stats" FROM t') is True
        assert vm.matches(None, {"path": "disk.io"}, 'FILTER path =~ "^stats" FROM t') is False


class TestCustomReaderRegistry:
    """files.RegisterFileHandler parity (datasource/files/filehandler.go:65):
    a runtime-registered reader makes a new source type available to
    CREATE SOURCE."""

    def test_register_reader_roundtrip(self, spark, tmp_path, engine):
        from qlbridge_spark.sources import register_reader, unregister_reader

        p = str(tmp_path / "data.tsvx")
        with open(p, "w") as f:
            f.write("a\t1\nb\t2\n")

        def tsvx_reader(spark_, path, cfg):
            return spark_.read.option("sep", "\t").schema("name string, v long").csv(path)

        register_reader("tsvx", tsvx_reader)
        try:
            engine.execute(f'CREATE SOURCE tx WITH {{"type": "tsvx", "path": "{p}", "table": "tx"}}')
            rows = engine.sql("SELECT name, v FROM tx ORDER BY name").collect()
            assert [(r["name"], r["v"]) for r in rows] == [("a", 1), ("b", 2)]
        finally:
            unregister_reader("tsvx")
            engine.execute("DROP TABLE tx")

    def test_unknown_type_still_errors(self, spark):
        import pytest as _pytest

        from qlbridge_spark.sources import SourceError, load_source

        with _pytest.raises(SourceError):
            load_source(spark, {"type": "nosuchformat", "path": "/tmp/x"})


class TestDeclaredUpsertKey:
    def test_upsert_uses_declared_key(self, spark):
        from qlbridge_spark import Engine

        eng = Engine(spark, "keytest")
        df = spark.createDataFrame([("x", "k1", 1.0), ("y", "k2", 2.0)], "extra string, id string, v double")
        # declared key is NOT the first column — heuristic would pick wrong
        eng.register_df("t", df, key="id")
        n = eng.execute('UPSERT INTO t (extra, id, v) VALUES ("z", "k1", 9.0)')
        assert n == 1
        rows = {r["id"]: (r["extra"], r["v"]) for r in eng.table("t").collect()}
        assert rows == {"k1": ("z", 9.0), "k2": ("y", 2.0)}  # replaced, not dup
