"""Custom destination decorator — ``@dlt.destination`` parity.

Re-expression of ``dlt/destinations/decorators.py``: a user function
receiving (batch, table_schema) becomes a sink.  On Spark the batch is
delivered per *partition* via ``foreachPartition`` (batch mode) or per
micro-batch via ``foreachBatch`` (streaming) — the two shapes the
reference's file-batch callback collapses into.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Iterator, Optional

from pyspark.sql import DataFrame

from ..schema.typing import TTableSchema


class CustomDestination:
    def __init__(
        self,
        sink_fn: Callable[[Any, TTableSchema], None],
        batch_size: int = 10_000,
        name: Optional[str] = None,
    ) -> None:
        self.sink_fn = sink_fn
        self.batch_size = batch_size
        self.name = name or sink_fn.__name__

    def write(self, df: DataFrame, table: TTableSchema) -> None:
        """Deliver the DataFrame to the sink function in arrow-record
        batches per partition.  The sink runs on executors — it must be
        picklable and own its connections (same contract as the
        reference's batch callback)."""
        sink_fn, batch_size = self.sink_fn, self.batch_size

        def run_partition(rows: Iterator[Any]) -> None:
            batch = []
            for row in rows:
                batch.append(row.asDict())
                if len(batch) >= batch_size:
                    sink_fn(batch, table)
                    batch = []
            if batch:
                sink_fn(batch, table)

        df.foreachPartition(run_partition)

    def write_stream(self, stream_df: DataFrame, table: TTableSchema, checkpoint: str):
        """Streaming shape: one call per micro-batch DataFrame.  The sink
        runs per PARTITION on executors, exactly like the batch path — a
        collect() here would funnel every micro-batch through the driver
        and OOM on the first large one."""
        write = self.write

        def run_batch(batch_df: DataFrame, batch_id: int) -> None:
            write(batch_df, table)

        return (
            stream_df.writeStream.foreachBatch(run_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


def destination(
    fn: Optional[Callable] = None, *, batch_size: int = 10_000, name: Optional[str] = None
) -> Any:
    """``@destination`` decorator."""

    def deco(f: Callable) -> CustomDestination:
        return CustomDestination(f, batch_size=batch_size, name=name)

    if fn is not None:
        return deco(fn)
    return deco
