"""Orchestration plans: Pipeline DAG + SQL script runner."""

from from_superset_to_clickhouse_spark.plans.pipeline import Pipeline, Step, SkipStep
from from_superset_to_clickhouse_spark.plans.script import render_params, run_script, split_statements

__all__ = ["Pipeline", "Step", "SkipStep", "render_params", "run_script", "split_statements"]
