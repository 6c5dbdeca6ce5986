from ilogtail_spark.functions import (  # noqa: F401
    dedup,
    multimodal,
    packing,
    similarity,
    textstats,
)
