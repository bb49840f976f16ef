"""The opentick SQL dialect: tokenizer → AST → resolved statement →
DataFrame plan.

The reference parses with a PEG grammar (parser.go:10-24) and resolves into
typed statements (query.go:345-530). We keep the same three stages so the
same SQL, placeholders, validation errors, and result semantics hold, but
execution compiles to Spark DataFrame plans where Catalyst supplies the
pushdown/pruning/limit behaviors the reference hand-built into FDB ranges.
"""

from opentick_spark.dialect.parser import parse
from opentick_spark.dialect import ast

__all__ = ["parse", "ast"]
