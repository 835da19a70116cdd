"""Helpers for asserting physical-plan properties in tests and tuning.

The reference hand-builds its physical execution (collectors, DocSet
algebra, facet processors — SURVEY.md §4); here Catalyst owns planning, so
our job is to VERIFY the plan has the shape we want: filters pushed to the
parquet scan, broadcast joins where a side is small, whole-stage codegen
spans, TakeOrderedAndProject for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    """True if every needle appears in the physical plan text."""
    text = explain_str(df, mode)
    return all(n in text for n in needles)
