"""Plan inspection surface: lint DataFrame plans for scale anti-patterns."""

from mapreduceindex_spark.plans.lint import (
    Finding,
    lint_plan,
    plan_stats,
    stats_from_text,
)

__all__ = ["Finding", "lint_plan", "plan_stats", "stats_from_text"]
