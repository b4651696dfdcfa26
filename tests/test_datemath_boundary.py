"""DateConverter boundary-analysis tests (vm/datemath.go parity).
Pure Python — no Spark session needed."""

from datetime import datetime, timedelta

from qlbridge_spark.datemath_boundary import DateConverter, boundary_time

NOW = datetime(2024, 6, 15, 12, 0, 0)


class TestDateConverter:
    def test_detects_datemath(self):
        dc = DateConverter({"created": NOW}, 'created > "now-3d"', now=NOW)
        assert dc.has_date_math
        assert dc.time_strings == ["now-3d"]

    def test_no_datemath(self):
        dc = DateConverter({"created": NOW}, "x > 5 AND y < 2", now=NOW)
        assert not dc.has_date_math and dc.boundary() is None

    def test_gt_boundary_future_flip(self):
        # created = now-1d; `created > "now-3d"` is true NOW, flips false
        # when the moving now-3d window passes created → in 2 days
        ct = NOW - timedelta(days=1)
        bt = boundary_time({"created": ct}, 'created > "now-3d"', now=NOW)
        assert bt == NOW + timedelta(days=2)

    def test_gt_no_boundary_when_false_forever(self):
        # created = now-5d; `created > "now-3d"` false and stays false
        ct = NOW - timedelta(days=5)
        assert boundary_time({"created": ct}, 'created > "now-3d"', now=NOW) is None

    def test_lt_boundary(self):
        # created = now-1d; `created < "now-3d"` false now, flips true in 2d
        ct = NOW - timedelta(days=1)
        bt = boundary_time({"created": ct}, 'created < "now-3d"', now=NOW)
        assert bt == NOW + timedelta(days=2)

    def test_lt_true_forever(self):
        ct = NOW - timedelta(days=5)
        assert boundary_time({"created": ct}, 'created < "now-3d"', now=NOW) is None

    def test_equality_ops_no_boundary(self):
        ct = NOW - timedelta(days=1)
        assert boundary_time({"created": ct}, 'created = "now-3d"', now=NOW) is None

    def test_earliest_of_multiple(self):
        ctx = {"a": NOW - timedelta(days=1), "b": NOW - timedelta(hours=1)}
        bt = boundary_time(ctx, 'a > "now-3d" AND b > "now-2h"', now=NOW)
        assert bt == NOW + timedelta(hours=1)  # b's flip comes first

    def test_string_ctx_value(self):
        bt = boundary_time({"created": "2024-06-14T12:00:00"}, 'created > "now-3d"', now=NOW)
        assert bt == NOW + timedelta(days=2)

    def test_filterql_nary(self):
        from qlbridge_spark.rel import parse_filterql

        stmt = parse_filterql('FILTER AND(created > "now-3d", x > 5) FROM t')
        dc = DateConverter({"created": NOW - timedelta(days=1)}, stmt.filter, now=NOW)
        assert dc.has_date_math and dc.boundary() == NOW + timedelta(days=2)
