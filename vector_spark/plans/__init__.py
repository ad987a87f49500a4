from vector_spark.plans.pipeline import Pipeline, PipelineResult  # noqa: F401
