"""`dlt.current` / `dlt.state()` analog: ambient access to the pipeline
executing the current ``run`` (reference ``dlt/current.py`` +
``dlt.state()`` — resource generators read/write their state dict
without threading the pipeline through every function).

A plain module-level stack (driver-side only, like the reference's
container): ``Pipeline.run`` pushes itself for the duration of extract
so generator bodies evaluated inside ``materialize`` see it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

_ACTIVE: List[Any] = []


def _push(pipe: Any) -> None:
    _ACTIVE.append(pipe)


def _pop() -> None:
    if _ACTIVE:
        _ACTIVE.pop()


def pipeline() -> Any:
    """The pipeline whose ``run`` is currently executing.

    Raises ``RuntimeError`` outside a run (same contract as the
    reference's ``dlt.current.pipeline()``)."""
    if not _ACTIVE:
        raise RuntimeError(
            "dlt_spark.current.pipeline() called outside a pipeline run"
        )
    return _ACTIVE[-1]


def source_state() -> Dict[str, Any]:
    """Mutable state dict of the current pipeline's dataset scope —
    persisted to ``_dlt_pipeline_state`` at commit."""
    p = pipeline()
    return p.state.source_state(p.dataset_name)


def resource_state(resource_name: str) -> Dict[str, Any]:
    """Mutable per-resource state dict (reference
    ``dlt.current.resource_state()``)."""
    p = pipeline()
    return p.state.resource_state(p.dataset_name, resource_name)
