from vector_spark.sources.readers import (  # noqa: F401
    read_source,
    file_source,
    generator_source,
    kafka_source,
    iceberg_source,
    stdin_source,
)
