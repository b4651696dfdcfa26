"""Elasticsearch DSL generator tests (no Spark needed) — mirrors the
reference's esgenerator_test.go expectations in shape."""

import json

from qlbridge_spark.exprparse import parse_expression
from qlbridge_spark.generators import filterql_to_es, to_es_query


class TestEsGen:
    def test_term(self):
        assert to_es_query('name = "bob"') == {"term": {"name": "bob"}}

    def test_not_term(self):
        assert to_es_query('name != "bob"') == {"bool": {"must_not": [{"term": {"name": "bob"}}]}}

    def test_range(self):
        assert to_es_query("age > 21") == {"range": {"age": {"gt": 21}}}
        assert to_es_query("age <= 21.5") == {"range": {"age": {"lte": 21.5}}}

    def test_between_exclusive(self):
        assert to_es_query("age BETWEEN 20 AND 30") == {"range": {"age": {"gt": 20, "lt": 30}}}

    def test_terms_in(self):
        assert to_es_query('state IN ("CA", "OR", "WA")') == {"terms": {"state": ["CA", "OR", "WA"]}}
        assert to_es_query("x NOT IN (1, 2)") == {"bool": {"must_not": [{"terms": {"x": [1, 2]}}]}}

    def test_exists_and_null(self):
        assert to_es_query("EXISTS email") == {"exists": {"field": "email"}}
        assert to_es_query("email != NULL") == {"exists": {"field": "email"}}
        assert to_es_query("email IS NULL") == {"bool": {"must_not": [{"exists": {"field": "email"}}]}}

    def test_wildcard_like_contains(self):
        assert to_es_query('url LIKE "%google%"') == {"wildcard": {"url": "*google*"}}
        assert to_es_query('url CONTAINS "maps"') == {"wildcard": {"url": "*maps*"}}

    def test_bool_nesting_and_flattening(self):
        q = to_es_query("a = 1 AND b = 2 AND c > 3")
        assert q == {
            "bool": {
                "filter": [
                    {"term": {"a": 1}},
                    {"term": {"b": 2}},
                    {"range": {"c": {"gt": 3}}},
                ]
            }
        }
        q2 = to_es_query("a = 1 OR b = 2")
        assert q2["bool"]["minimum_should_match"] == 1

    def test_datemath_passthrough(self):
        # ES evaluates "now-3d" natively (vm/datemath.go ↔ ES date math)
        assert to_es_query('created > "now-3d"') == {"range": {"created": {"gt": "now-3d"}}}

    def test_filterql_statement(self):
        body = json.loads(filterql_to_es('FILTER AND(age > 21, state = "CA") FROM users LIMIT 100'))
        assert body["size"] == 100
        assert body["query"]["bool"]["filter"][0] == {"range": {"age": {"gt": 21}}}

    def test_filterql_match_all(self):
        body = json.loads(filterql_to_es("FILTER * FROM t"))
        assert body["query"] == {"match_all": {}}

    def test_include_inlined(self):
        inc = {"adult": parse_expression("age >= 18")}
        q = to_es_query("INCLUDE adult AND state = \"CA\"", includes=inc)
        assert q["bool"]["filter"][0] == {"range": {"age": {"gte": 18}}}

    def test_nary_filterql_forms(self):
        body = json.loads(filterql_to_es('FILTER OR(x = 1, AND(y = 2, z = 3), NOT w = 4)'))
        should = body["query"]["bool"]["should"]
        assert len(should) == 3
        assert should[2] == {"bool": {"must_not": [{"term": {"w": 4}}]}}
