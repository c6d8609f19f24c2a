"""Judged query inventory — importing this package registers every
implemented operator from SURVEY.md §2 into the registry."""

from delta_lake_play_spark.queries import (  # noqa: F401
    aggregates,
    filters,
    flagship,
    joins,
    scans,
    sorts_sets,
)
