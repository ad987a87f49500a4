from vector_spark.functions import vrl  # noqa: F401
