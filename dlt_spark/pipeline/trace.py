"""Pipeline run trace — step-level timings and results.

Re-expression of ``dlt/pipeline/trace.py`` (``PipelineStepTrace:67-90``,
``PipelineTrace:133-170``, ``start_trace:212`` / ``end_trace_step:246``)
without the telemetry transport: a trace is a plain in-memory record of
one ``run()`` (or a standalone ``extract/normalize/load`` call) that a
user can inspect (``pipeline.last_trace``), log, or ship to their own
telemetry.  Spark-specific: each step also snapshots the delta of
executed Spark jobs/stages via the status tracker, so "how much cluster
work did load do" is answerable without the Spark UI.
"""

from __future__ import annotations

import datetime as dt
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc)


@dataclass
class PipelineStepTrace:
    """One step (extract / normalize / load) of a run
    (reference ``trace.py:67-90``)."""

    span_id: str
    step: str
    started_at: dt.datetime
    finished_at: Optional[dt.datetime] = None
    step_info: Optional[Any] = None  # ExtractInfo / NormalizeInfo / LoadInfo
    step_exception: Optional[str] = None
    spark_jobs: Optional[int] = None  # jobs launched during this step

    @property
    def elapsed(self) -> Optional[float]:
        if self.finished_at is None:
            return None
        return (self.finished_at - self.started_at).total_seconds()

    def asdict(self) -> dict:
        return {
            "span_id": self.span_id,
            "step": self.step,
            "started_at": self.started_at.isoformat(),
            "finished_at": self.finished_at.isoformat() if self.finished_at else None,
            "elapsed": self.elapsed,
            "step_exception": self.step_exception,
            "spark_jobs": self.spark_jobs,
        }

    def asstr(self) -> str:
        state = "COMPLETED" if self.step_exception is None else "FAILED"
        el = f"{self.elapsed:.3f}s" if self.elapsed is not None else "?"
        jobs = f", {self.spark_jobs} spark jobs" if self.spark_jobs else ""
        return f"Step {self.step} {state} in {el}{jobs}"


@dataclass
class PipelineTrace:
    """Trace of one run (reference ``trace.py:133-170``)."""

    transaction_id: str
    pipeline_name: str
    started_at: dt.datetime
    finished_at: Optional[dt.datetime] = None
    steps: List[PipelineStepTrace] = field(default_factory=list)

    @property
    def elapsed(self) -> Optional[float]:
        if self.finished_at is None:
            return None
        return (self.finished_at - self.started_at).total_seconds()

    def last_step(self, step: str) -> Optional[PipelineStepTrace]:
        matching = [s for s in self.steps if s.step == step]
        return max(matching, key=lambda s: s.started_at) if matching else None

    def asdict(self) -> dict:
        return {
            "transaction_id": self.transaction_id,
            "pipeline_name": self.pipeline_name,
            "started_at": self.started_at.isoformat(),
            "finished_at": self.finished_at.isoformat() if self.finished_at else None,
            "elapsed": self.elapsed,
            "steps": [s.asdict() for s in self.steps],
        }

    def asstr(self) -> str:
        el = f"{self.elapsed:.3f}s" if self.elapsed is not None else "?"
        lines = [f"Run {self.pipeline_name} completed in {el} with {len(self.steps)} steps:"]
        lines += ["  " + s.asstr() for s in self.steps]
        return "\n".join(lines)


def start_trace(pipeline_name: str) -> PipelineTrace:
    return PipelineTrace(
        transaction_id=uuid.uuid4().hex, pipeline_name=pipeline_name, started_at=_now()
    )


class TraceStep:
    """Context manager recording one step into a trace, including the
    number of Spark jobs the step launched (status-tracker delta)."""

    def __init__(self, trace: PipelineTrace, step: str, spark: Any = None) -> None:
        self.trace = trace
        self.step_trace = PipelineStepTrace(
            span_id=uuid.uuid4().hex[:16], step=step, started_at=_now()
        )
        self.spark = spark
        self._prev_props: Dict[str, Any] = {}

    _GROUP_PROPS = (
        "spark.jobGroup.id",
        "spark.job.description",
        "spark.job.interruptOnCancel",
    )

    def __enter__(self) -> PipelineStepTrace:
        # Scope the step under its own Spark job group so the job count
        # is a small per-group lookup.  (getJobIdsForGroup(None) returns
        # EVERY job id the session ever ran — in a long-lived session the
        # py4j array transfer grows with session age and a per-step call
        # became measurably slow after a few thousand jobs.)
        if self.spark is not None:
            try:
                sc = self.spark.sparkContext
                # setJobGroup sets THREE local properties; capture all of
                # them so jobs run after the step aren't labeled with the
                # stale step description in the Spark UI
                self._prev_props = {
                    k: sc.getLocalProperty(k) for k in self._GROUP_PROPS
                }
                sc.setJobGroup(
                    self.step_trace.span_id, f"dlt step {self.step_trace.step}"
                )
            except Exception:
                self.spark = None
        self.trace.steps.append(self.step_trace)
        return self.step_trace

    def __exit__(self, exc_type, exc, tb) -> None:
        self.step_trace.finished_at = _now()
        if self.spark is not None:
            try:
                sc = self.spark.sparkContext
                ids = sc.statusTracker().getJobIdsForGroup(self.step_trace.span_id)
                self.step_trace.spark_jobs = len(ids)
                for k, v in self._prev_props.items():
                    sc.setLocalProperty(k, v)
            except Exception:
                pass
        if exc is not None:
            self.step_trace.step_exception = f"{type(exc).__name__}: {exc}"
        return None
