"""Pipeline trace tests (reference tests/pipeline/test_pipeline_trace.py
shapes: steps recorded for a run, timings present, failures captured,
standalone step gets its own trace)."""

import pytest

import dlt_spark


@pytest.fixture()
def pipe(spark, tmp_path):
    return dlt_spark.pipeline(
        "trace_pipe", destination=str(tmp_path / "d"), dataset_name="ds", spark=spark
    )


def test_run_records_three_steps(pipe):
    pipe.run([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], table_name="t")
    tr = pipe.last_trace
    assert tr is not None
    assert [s.step for s in tr.steps] == ["extract", "normalize", "load"]
    assert all(s.elapsed is not None and s.elapsed >= 0 for s in tr.steps)
    assert tr.elapsed is not None
    # load launches distributed work; the tracker must see jobs
    assert tr.last_step("load").spark_jobs >= 1
    # step_info carries the stage results
    assert tr.last_step("load").step_info.tables == ["t"]
    d = tr.asdict()
    assert len(d["steps"]) == 3 and d["pipeline_name"] == "trace_pipe"
    assert "load COMPLETED" in tr.asstr()


def test_second_run_replaces_trace(pipe):
    pipe.run([{"id": 1}], table_name="t")
    t1 = pipe.last_trace.transaction_id
    pipe.run([{"id": 2}], table_name="t")
    assert pipe.last_trace.transaction_id != t1
    assert len(pipe.last_trace.steps) == 3


def test_failed_step_captured(pipe):
    with pytest.raises(ValueError):
        pipe.load()  # nothing normalized
    # the failure happened before any traced step — now fail inside one
    class Boom:
        def __iter__(self):
            raise RuntimeError("source exploded")

    with pytest.raises(RuntimeError, match="source exploded"):
        pipe.run(Boom(), table_name="t")
    tr = pipe.last_trace
    assert tr.steps[0].step == "extract"
    assert "source exploded" in (tr.steps[0].step_exception or "")
    assert tr.finished_at is not None


def test_standalone_step_gets_own_trace(pipe):
    pipe.extract([{"id": 1}], table_name="t")
    tr = pipe.last_trace
    assert [s.step for s in tr.steps] == ["extract"]
    assert tr.finished_at is not None
    pipe.normalize()
    assert [s.step for s in pipe.last_trace.steps] == ["normalize"]


def test_progress_log_collector(spark, tmp_path, capfd):
    import dlt_spark

    pipe = dlt_spark.pipeline(
        "prg", str(tmp_path / "prg"), "ds", spark, progress="log"
    )
    pipe.run([{"a": 1}], table_name="t")
    err = capfd.readouterr().err
    assert "[prg] extract done" in err
    assert "[prg] load done" in err


def test_step_restores_job_description(pipe, spark):
    """TraceStep scopes jobs under a per-step group; on exit ALL the
    group-related local properties must be restored, or jobs run after
    the pipeline carry the stale step label in the Spark UI."""
    sc = spark.sparkContext
    sc.setJobGroup("outer-group", "outer description")
    try:
        pipe.run([{"id": 1}], table_name="t")
        assert sc.getLocalProperty("spark.jobGroup.id") == "outer-group"
        assert (
            sc.getLocalProperty("spark.job.description")
            == "outer description"
        )
    finally:
        for k in ("spark.jobGroup.id", "spark.job.description",
                  "spark.job.interruptOnCancel"):
            sc.setLocalProperty(k, None)


def test_progress_collectors(spark, tmp_path, capfd):
    """dlt.progress parity (reference dlt/pipeline/progress.py): named
    'log' collector resolves and fires per step; a custom Collector
    object passes through; unknown names fail loudly."""
    import pytest

    import dlt_spark
    from dlt_spark.pipeline.progress import Collector, _from_name

    seen = []

    class Capture(Collector):
        def on_step(self, pipeline_name, step, seconds):
            seen.append((pipeline_name, step))

    pipe = dlt_spark.pipeline(
        "prog_pipe", str(tmp_path / "p"), "ds", spark, progress=Capture()
    )
    pipe.run([{"id": 1}], table_name="t")
    assert [s for _, s in seen] == ["extract", "normalize", "load"]
    assert all(n == "prog_pipe" for n, _ in seen)
    # module surface: dlt_spark.progress like dlt.progress
    assert dlt_spark.progress.log is not None
    with pytest.raises(ValueError):
        _from_name("enlighten_nope")


def test_tqdm_collector_rolls_over_between_runs():
    """ADVICE r8: TqdmCollector hardcoded total=3 and overflowed on a
    second run(); the bar must roll over once n reaches total."""
    import sys
    import types
    from unittest import mock

    bars = []

    class FakeBar:
        def __init__(self, total=None, desc=None, leave=None):
            self.total, self.n, self.closed = total, 0, False
            bars.append(self)

        def set_postfix_str(self, s):
            self.postfix = s

        def update(self, k):
            self.n += k
            assert self.n <= self.total, "bar overflowed its total"

        def close(self):
            self.closed = True

    fake_mod = types.ModuleType("tqdm")
    fake_mod.tqdm = FakeBar
    with mock.patch.dict(sys.modules, {"tqdm": fake_mod}):
        from dlt_spark.pipeline.progress import TqdmCollector

        c = TqdmCollector()
        for run in range(2):
            for step in ("extract", "normalize", "load"):
                c.on_step("p", step, 0.1)
    assert len(bars) == 2 and bars[0].closed and bars[1].n == 3
