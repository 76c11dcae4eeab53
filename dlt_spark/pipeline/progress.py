"""Pipeline progress collectors (reference ``dlt/pipeline/progress.py``
+ ``dlt/common/runtime/collector.py``): named collectors resolve from
the ``pipeline(progress=...)`` argument; a custom ``Collector`` object
passes through.  The step granularity here is the pipeline step
(extract/normalize/load) — Spark owns intra-step task progress (its UI
/ status tracker), so per-row counters would be fiction.
"""

from __future__ import annotations

import sys
from typing import Optional, Union


class Collector:
    """Base collector: one callback per finished pipeline step
    (reference Collector's update/_step lifecycle collapsed to the
    step-level signal that is meaningful under Spark execution)."""

    def on_step(self, pipeline_name: str, step: str, seconds: float) -> None:
        raise NotImplementedError


class NullCollector(Collector):
    def on_step(self, pipeline_name: str, step: str, seconds: float) -> None:
        return


class LogCollector(Collector):
    """Prints one line per finished step (reference LogCollector)."""

    def __init__(self, stream=None) -> None:
        self.stream = stream

    def on_step(self, pipeline_name: str, step: str, seconds: float) -> None:
        print(
            f"[{pipeline_name}] {step} done in {seconds:.2f}s",
            file=self.stream or sys.stderr,
        )


class TqdmCollector(Collector):
    """Step progress as a tqdm bar (reference TqdmCollector); requires
    the optional tqdm package, like the reference's extras."""

    def __init__(self) -> None:
        try:
            from tqdm import tqdm
        except ImportError as ex:  # same failure mode as the reference
            raise ImportError(
                "tqdm is not installed; pass progress='log' or install tqdm"
            ) from ex
        self._tqdm = tqdm
        self._bar = tqdm(total=3, desc="pipeline", leave=False)

    def on_step(self, pipeline_name: str, step: str, seconds: float) -> None:
        if self._bar.n >= self._bar.total:
            # a collector instance outlives one run() (reference
            # collectors restart per _step); roll the bar over so a
            # second run / standalone step doesn't overflow it
            self._bar.close()
            self._bar = self._tqdm(total=3, desc="pipeline", leave=False)
        self._bar.set_postfix_str(f"{step} {seconds:.2f}s")
        self._bar.update(1)


#: reference progress.py exposes collector constructors by name
log = LogCollector
tqdm = TqdmCollector
NULL_COLLECTOR = NullCollector()

TCollectorArg = Union[Collector, str, None]


def _from_name(collector: TCollectorArg) -> Collector:
    """Resolve the ``pipeline(progress=...)`` argument (reference
    ``progress.py:16 _from_name``)."""
    if collector is None:
        return NULL_COLLECTOR
    if isinstance(collector, Collector):
        return collector
    if collector == "log":
        return LogCollector()
    if collector == "tqdm":
        return TqdmCollector()
    raise ValueError(f"unknown progress collector {collector!r}")
