from ilogtail_spark.functions import dedup, multimodal, similarity, textstats  # noqa: F401
