"""Log/metrics sink (SURVEY §2.1 S10; reference scheduler.py:21-28).

The reference logs per-cycle, per-flow row counts through a logging
sink.  Spark-first, that splits into two native mechanisms:

* ``EtlMetricsListener`` — a ``StreamingQueryListener`` attached to the
  session: every structured-streaming micro-batch reports (query name,
  batch id, input rows, duration) with zero extra jobs, the streaming
  twin of the reference's per-cycle log lines.
* ``FlowObserver`` — ``Observation``-based per-flow output row counts
  for the batch flows (clearsight and the incremental pipeline): the
  count rides the flow's own action, so metrics never add a pass over
  the data (collect-free, scale-indifferent).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQueryListener


class EtlMetricsListener(StreamingQueryListener):
    """Session-wide streaming metrics collector + log sink.

    Records one dict per micro-batch progress event; ``log`` (default:
    print) receives the reference-shaped one-liner.  Attach with
    :func:`attach_metrics_listener`; detach via ``detach``.
    """

    def __init__(self, log: Callable[[str], None] | None = None):
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []
        self._log = log if log is not None else (lambda msg: print(msg))

    # -- listener callbacks (called from Spark's listener bus) ----------
    def onQueryStarted(self, event) -> None:
        self.started.append(event.name or str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "name": p.name or str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs or {}),
            "timestamp": p.timestamp,
        }
        self.progress.append(rec)
        self._log(
            f"[etl_pipe_spark] stream={rec['name']} batch={rec['batch_id']} "
            f"rows={rec['num_input_rows']}"
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # -- management -----------------------------------------------------
    def rows_for(self, name: str) -> int:
        return sum(r["num_input_rows"] for r in self.progress if r["name"] == name)

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)


def attach_metrics_listener(
    spark: SparkSession, log: Callable[[str], None] | None = None
) -> EtlMetricsListener:
    listener = EtlMetricsListener(log)
    spark.streams.addListener(listener)
    return listener


class FlowObserver:
    """Per-flow observed output row counts for batch flows.

    ``wrap(name, df)`` plants an ``Observation`` at the flow's output;
    after the flow's own action ran (sink write, collect), ``counts()``
    returns {flow: rows_out} and ``emit()`` sends the reference-shaped
    log lines.  Reading an Observation blocks until its job finishes,
    so call ``counts()`` only after the cycle's actions.
    """

    def __init__(self, log: Callable[[str], None] | None = None):
        self._obs: dict[str, Observation] = {}
        self._log = log if log is not None else (lambda msg: print(msg))

    def wrap(self, name: str, df: DataFrame) -> DataFrame:
        obs = Observation(f"flow_{name}")
        self._obs[name] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows_out"))

    def counts(self) -> dict[str, int]:
        return {name: obs.get["rows_out"] for name, obs in self._obs.items()}

    def emit(self) -> dict[str, int]:
        counts = self.counts()
        for name, n in counts.items():
            self._log(f"[etl_pipe_spark] flow={name} rows_out={n}")
        return counts


def observe_clearsight_cycle(
    src: dict[str, DataFrame], since, log: Callable[[str], None] | None = None
) -> tuple[dict[str, DataFrame], FlowObserver]:
    """All six ClearSight flows with output metrics attached (S10).

    Returns ({flow_name: observed DataFrame}, observer); run each flow
    through its sink, then ``observer.emit()`` logs per-flow counts —
    the exact surface of the reference's per-cycle log sink.
    """
    from ..flows import clearsight as CS

    flows = {
        "scenarios": CS.scenarios_flow(src, since),
        "node_data": CS.node_data_flow(src, since),
        "runs": CS.runs_flow(src, since),
        "node_calc": CS.node_calc_flow(src, since),
        "event_data": CS.event_data_flow(src, since),
        "timeline": CS.timeline_flow(src, since),
    }
    observer = FlowObserver(log)
    return {name: observer.wrap(name, df) for name, df in flows.items()}, observer
