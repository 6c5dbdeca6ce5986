from ilogtail_spark.plans.pipeline import FLAGSHIP_SPEC, build_pipeline, run_pipeline

__all__ = ["FLAGSHIP_SPEC", "build_pipeline", "run_pipeline"]
