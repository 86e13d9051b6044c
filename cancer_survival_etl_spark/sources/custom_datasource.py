"""Custom connector via the Spark 4 Python DataSource API.

The reference ingests from sources Spark has no reader for (scraped
NHS publication pages feeding Excel files — reference:
src/utils/scrape_util.py). The modern Spark-native answer is a custom
``DataSource``: planning happens on the driver (list partitions),
reading happens ON EXECUTORS, one task per ``InputPartition`` — so a
custom source scales exactly like a built-in one instead of funneling
through a driver-side pandas shim.

``SyntheticEventsDataSource`` is the registered demonstration source:
a deterministic event-stream generator (seeded per partition — same
output any cluster size) used for load/soak testing without touching
the lake. The same four-method shape (schema / partitions / read /
register) is the template for any real connector (REST pages, message
queue snapshots, proprietary formats).

Usage:
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows_per_partition", 1000)
          .option("num_partitions", 8)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_TYPES = ["click", "view", "purchase", "scroll", "hover"]


class _EventsPartition(InputPartition):
    def __init__(self, index: int, rows: int, seed: int):
        self.index = index
        self.rows = rows
        self.seed = seed


class _EventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows_per_partition", 1000))
        self.parts = int(options.get("num_partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [
            _EventsPartition(i, self.rows, self.seed) for i in range(self.parts)
        ]

    def read(self, partition: _EventsPartition):
        # runs on an executor; deterministic per (seed, partition index)
        import datetime as dt
        import random

        rnd = random.Random((partition.seed << 20) ^ partition.index)
        base = dt.datetime(2026, 1, 1)
        start = partition.index * partition.rows
        for i in range(partition.rows):
            eid = start + i
            yield (
                eid,
                base + dt.timedelta(seconds=rnd.randint(0, 86_400 * 30)),
                rnd.randint(0, 499),
                _TYPES[rnd.randint(0, len(_TYPES) - 1)],
                round(rnd.random() * 100, 2),
            )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return EVENT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _EventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _EventsStreamReader(self.options)


class _EventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: offsets are plain event-id
    watermarks; each micro-batch deterministically generates the next
    ``rows_per_batch`` events, and ``readBetweenOffsets`` regenerates
    any committed range bit-identically — which is what makes the
    source replayable (exactly-once with a checkpointed sink)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"next_id": 0}

    def _gen(self, start: int, end: int):
        import datetime as dt
        import random

        base = dt.datetime(2026, 1, 1)
        for eid in range(start, end):
            rnd = random.Random((self.seed << 20) ^ eid)
            yield (
                eid,
                base + dt.timedelta(seconds=rnd.randint(0, 86_400 * 30)),
                rnd.randint(0, 499),
                _TYPES[rnd.randint(0, len(_TYPES) - 1)],
                round(rnd.random() * 100, 2),
            )

    def read(self, start: dict):
        # materialized list, not a generator: the runner's prefetch
        # cache shallow-copies the returned iterator
        s = start["next_id"]
        e = s + self.rows_per_batch
        return list(self._gen(s, e)), {"next_id": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._gen(start["next_id"], end["next_id"]))
