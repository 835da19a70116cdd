"""Plan-inspection helpers (Catalyst is the planner — SURVEY.md §4)."""

from apache___solr_spark.plans.inspect import explain_str, plan_has  # noqa: F401
