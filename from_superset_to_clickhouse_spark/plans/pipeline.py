"""Pipeline: the reference's Airflow DAG surface as plain Python.

Models SURVEY.md §2.8 rows 39-44: sequencing with fan-out groups
(``v2/dag.py:156-169``), conditional skip (``AirflowSkipException`` at
``v2/dag.py:126-130``), runtime config switch (``v2/dag.py:43-51``), and
step logging. Parallel groups share one SparkSession — the Spark
scheduler multiplexes concurrent jobs; correctness is identical run
sequentially, so ``parallel=False`` is the default for determinism.
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

log = logging.getLogger(__name__)


class SkipStep(Exception):
    """Raise inside a step to skip it (the AirflowSkipException analog)."""


@dataclass
class Step:
    name: str
    fn: Callable[[dict], Any]
    when: Callable[[dict], bool] | None = None  # False → skip


@dataclass
class Pipeline:
    """Ordered stages; each stage is a Step or a list of Steps (fan-out)."""

    name: str
    stages: Sequence[Step | Sequence[Step]]
    config: dict = field(default_factory=dict)
    parallel: bool = False

    def run(self, **overrides) -> dict[str, Any]:
        """Execute; returns {step_name: result | 'SKIPPED'}."""
        ctx = {**self.config, **overrides}
        results: dict[str, Any] = {}

        def run_step(step: Step):
            if step.when is not None and not step.when(ctx):
                log.info("pipeline %s: step %s skipped (condition)", self.name, step.name)
                return "SKIPPED"
            t0 = time.monotonic()
            try:
                out = step.fn(ctx)
            except SkipStep as e:
                log.info("pipeline %s: step %s skipped (%s)", self.name, step.name, e)
                return "SKIPPED"
            log.info(
                "pipeline %s: step %s done in %.2fs", self.name, step.name,
                time.monotonic() - t0,
            )
            return out

        for stage in self.stages:
            if isinstance(stage, Step):
                results[stage.name] = run_step(stage)
            elif self.parallel and len(stage) > 1:
                with ThreadPoolExecutor(max_workers=len(stage)) as ex:
                    futs = {s.name: ex.submit(run_step, s) for s in stage}
                    for n, f in futs.items():
                        results[n] = f.result()
            else:
                for s in stage:
                    results[s.name] = run_step(s)
        return results
