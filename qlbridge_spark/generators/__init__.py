"""Query generators: compile FilterQL / WHERE expressions into external
query DSLs for source-owned full pushdown (reference:
/root/reference/generators/elasticsearch/)."""

from .esgen import filterql_to_es, to_es_query

__all__ = ["to_es_query", "filterql_to_es"]
