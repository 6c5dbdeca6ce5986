from ilogtail_spark.operators import (  # noqa: F401
    aggregate,
    apsara,
    container,
    convert,
    enrich,
    filters,
    multiline,
    parse,
    prom,
    route,
    timeparse,
    transform,
)
