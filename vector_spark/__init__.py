"""vector_spark — a PySpark-native rebuild of Vector's (timberio/vector)
parse → enrich → route → aggregate pipeline semantics.

NOT a port: Vector is a per-event Rust streaming engine; this package
re-expresses the same operator semantics as declarative DataFrame /
Catalyst plans with vectorized pandas/Arrow UDFs only where builtins
cannot express the semantics. See SURVEY.md for the operator-by-operator
mapping against the reference (file:line cites in each module).
"""

__version__ = "0.1.0"

from vector_spark.session import get_spark  # noqa: F401
