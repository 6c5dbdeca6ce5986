from ilogtail_spark.sources.tables import TABLES, load_table, register_views
from ilogtail_spark.sources.transcripts import (
    TRANSCRIPTS_SQL_BODY,
    transcripts_df,
    transcripts_oracle_cte,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "TRANSCRIPTS_SQL_BODY",
    "transcripts_df",
    "transcripts_oracle_cte",
]
