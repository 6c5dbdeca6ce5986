from ilogtail_spark.operators import (  # noqa: F401
    aggregate,
    enrich,
    filters,
    multiline,
    parse,
    route,
    timeparse,
    transform,
)
