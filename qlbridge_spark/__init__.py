"""qlbridge_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of araddon/qlbridge (reference read-only at
/root/reference/; see SURVEY.md).

Architecture (SURVEY §7.1): custom parsers for the qlbridge dialects
(SQL / FilterQL / expressions) → expression AST → translation to
pyspark.sql Column/DataFrame plans. Catalyst + Tungsten replace the
reference's plan/ and exec/ layers entirely; datasources are Spark readers;
the ~70-function builtin library is re-expressed over pyspark.sql.functions.
"""

from .engine import Engine, ExecError
from .exprparse import ParseError, parse_expression
from .functions import func_add, registry as function_registry
from .planner import EsDataFrameSource, SourcePlanner, rewrite_source_select
from .rel import parse_filterql, parse_sql, parse_sql_statements
from .translate import Scope, TranslateError, to_column

__all__ = [
    "Engine",
    "EsDataFrameSource",
    "ExecError",
    "ParseError",
    "SourcePlanner",
    "TranslateError",
    "Scope",
    "func_add",
    "function_registry",
    "parse_expression",
    "parse_filterql",
    "parse_sql",
    "parse_sql_statements",
    "rewrite_source_select",
    "to_column",
]

__version__ = "0.1.0"
