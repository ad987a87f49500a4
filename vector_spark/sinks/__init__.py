from vector_spark.sinks.writers import write_sink  # noqa: F401
