"""Plan inspection / scale-audit utilities."""

from delta_lake_play_spark.plans.inspect import (  # noqa: F401
    PlanSummary,
    assert_scalable,
    broadcast_subtrees,
    executed_plan,
    formatted_plan,
    summarize,
)
