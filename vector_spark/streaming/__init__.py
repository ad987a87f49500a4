from vector_spark.streaming.ops import (  # noqa: F401
    stream_aggregate,
    stream_chunk_tokens,
    stream_dedupe,
    stream_enrich,
    stream_reduce_sessions,
    stream_route_writer,
)
