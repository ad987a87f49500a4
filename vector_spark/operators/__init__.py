"""Operator library: one module per Vector transform family.

Every operator is a pure function ``(DataFrame, **config) -> DataFrame``
(or ``-> dict[str, DataFrame]`` for fan-out ops) that builds a
declarative plan — no actions, no driver-side loops — so Catalyst can
fuse, push down, and prune across operator boundaries exactly as if
the user had written one query.
"""

from vector_spark.operators.core import (  # noqa: F401
    dedupe,
    field_filter,
    filter_events,
    route_flags,
    route_split,
    sample,
)
from vector_spark.operators.shapers import (  # noqa: F401
    add_fields,
    ansi_stripper,
    coercer,
    concat_fields,
    remove_fields,
    rename_fields,
)
from vector_spark.operators.parsers import (  # noqa: F401
    json_array_parser,
    json_parser,
    key_value_parser,
    logfmt_parser,
    regex_parser,
    split_fields,
    tokenizer,
)
from vector_spark.operators.grok import grok_parser  # noqa: F401
from vector_spark.operators.metrics import (  # noqa: F401
    add_tags,
    aggregate_metrics,
    log_to_metric,
    metric_to_log,
    remove_tags,
    tag_cardinality_limit,
)
from vector_spark.operators.reduce import merge_partial, reduce_events  # noqa: F401
from vector_spark.operators.enrich import enrich  # noqa: F401
from vector_spark.operators.remap import remap, remap_program  # noqa: F401
