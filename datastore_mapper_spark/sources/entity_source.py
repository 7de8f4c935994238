"""Custom Python Data Source: a simulated Datastore kind scan
(Spark 4 ``pyspark.sql.datasource`` API).

The reference reads entities from Cloud Datastore by splitting the
keyspace into balanced key ranges (``__scatter__`` samples) and
scanning each range in its own shard `[REF-mem: namespace.go,
shard.go]`.  This source re-creates that contract on Spark's pluggable
data-source API:

- ``partitions()`` returns one :class:`KeyRange` per shard — the
  scatter-split analogue; Spark schedules one task per range, so scan
  parallelism is declared by the SOURCE, exactly like the reference;
- ``read(partition)`` yields only that range's entities — a real
  connector would issue the Datastore/BigQuery range query here; the
  simulation generates deterministic rows (seeded by key) so tests can
  assert content;
- options (``kind``, ``num_entities``, ``num_shards``, ``namespace``)
  mirror the reference's job config.

The point is the shape, not the fake data: swapping ``read`` for RPC
calls yields a production connector with zero changes to the engine —
filters/projections still apply Spark-side, and the 100 TB posture is
"many small key ranges, one per task" as in SCALE.md's scan section.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ENTITY_SCHEMA = StructType(
    [
        StructField("__key__", LongType()),
        StructField("kind", StringType()),
        StructField("namespace", StringType()),
        StructField("payload", StringType()),
    ]
)


class KeyRange(InputPartition):
    """One shard's [start, end) key range — the scatter-split unit."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EntityReader(DataSourceReader):
    def __init__(self, options: dict):
        self.kind = options.get("kind", "entity")
        self.namespace = options.get("namespace", "default")
        self.num_entities = int(options.get("num_entities", 1000))
        self.num_shards = int(options.get("num_shards", 4))
        # keyspace shape: "dense" (keys 0..n-1, the original
        # simulation) or "zipf" (heavy-tailed key GAPS — the skewed
        # production keyspace a datastore accumulates after years of
        # deletes/hotspots).  split: "scatter" (sample-rank bounds,
        # the reference's __scatter__ mechanism) or "arithmetic"
        # (even VALUE-space slicing — kept as the foil: it shatters
        # on a skewed keyspace, which is exactly why the reference
        # samples).
        self.keyspace = options.get("keyspace", "dense")
        self.split = options.get("split", "scatter")
        self.zipf_a = float(options.get("zipf_a", 2.0))
        self.seed = int(options.get("seed", 7))

    def _zipf_keys(self):
        """The simulated skewed keyspace: sorted int64 keys whose
        GAPS are Zipf-distributed (deterministic seed).  A real
        connector never materializes this — the key population lives
        server-side and only the ~0.78% __scatter__ sample crosses
        the wire; the simulation regenerates it cheaply (numpy
        cumsum) in both the planner and each task."""
        import numpy as np

        gaps = np.random.default_rng(self.seed).zipf(
            self.zipf_a, size=self.num_entities).astype(np.int64)
        return np.cumsum(gaps)

    def partitions(self) -> Sequence[KeyRange]:
        """Balanced key ranges ≙ sorted __scatter__ split points.

        The scatter mechanism (round-15 VERDICT task 6): sample
        ~0.78% of keys (every 128th — the deterministic stand-in for
        Datastore's 1/128 __scatter__ property), sort, and cut at
        even RANKS.  Ranks equalize entity COUNTS per shard no
        matter how skewed the key VALUES are; arithmetic value-space
        bounds equalize only the value span, so a Zipf keyspace
        piles most entities into the low shards."""
        n, shards = self.num_entities, self.num_shards
        if self.keyspace == "dense":
            # dense keys: rank-splitting a 1/128 sample reduces to
            # the even index cut (sample ranks ARE key ranks)
            bounds = [round(i * n / shards) for i in range(shards + 1)]
            return [KeyRange(a, b)
                    for a, b in zip(bounds, bounds[1:]) if a < b]
        keys = self._zipf_keys()
        lo, hi = int(keys[0]), int(keys[-1]) + 1
        if self.split == "arithmetic":
            bounds = [lo + round(i * (hi - lo) / shards)
                      for i in range(shards + 1)]
        else:
            sample = keys[::128]
            bounds = [lo]
            for i in range(1, shards):
                r = min(len(sample) - 1, round(i * len(sample) / shards))
                bounds.append(int(sample[r]))
            bounds.append(hi)
        return [KeyRange(a, b)
                for a, b in zip(bounds, bounds[1:]) if a < b]

    def read(self, partition: KeyRange) -> Iterator:
        """Range scan: a real connector would issue the RPC query here
        (resuming from a cursor on retry — Spark re-runs the whole
        partition instead, same exactly-once result).  Emits
        ``pyarrow.RecordBatch``es built columnar (numpy arange +
        vectorized Arrow string kernels) — the per-row tuple loop was
        the round-15 scale advisory; a real connector would likewise
        hand the RPC response pages over as Arrow batches."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        if self.keyspace == "dense":
            universe = None
        else:       # slice the simulated skewed keyspace to the range
            ks = self._zipf_keys()
            universe = ks[np.searchsorted(ks, partition.start):
                          np.searchsorted(ks, partition.end)]
        step = 1 << 16
        total = (partition.end - partition.start
                 if universe is None else len(universe))
        for off in range(0, total, step):
            if universe is None:
                keys = pa.array(np.arange(
                    partition.start + off,
                    min(partition.start + off + step, partition.end),
                    dtype=np.int64))
            else:
                keys = pa.array(universe[off:off + step])
            n = len(keys)
            payload = pc.binary_join_element_wise(
                pa.repeat(pa.scalar(self.kind), n),
                pc.utf8_lpad(pc.cast(keys, pa.string()), 8, "0"),
                "-")
            yield pa.RecordBatch.from_arrays(
                [keys,
                 pa.repeat(pa.scalar(self.kind), n),
                 pa.repeat(pa.scalar(self.namespace), n),
                 payload],
                names=["__key__", "kind", "namespace", "payload"])


class EntityDataSource(DataSource):
    """``spark.read.format("datastore_entity")`` after
    ``spark.dataSource.register(EntityDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "datastore_entity"

    def schema(self) -> StructType:
        return ENTITY_SCHEMA

    def reader(self, schema: StructType) -> EntityReader:
        return EntityReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "EntityStreamReader":
        return EntityStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "EntityWriter":
        return EntityWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(EntityDataSource)


class EntityStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of :class:`EntityReader`: a simulated Datastore
    CHANGEFEED.  The offset is the high-water entity key — exactly the
    reference's per-slice cursor persisted between slices (slice.go
    `[REF-mem]`, SURVEY §2.A A9), except Spark's checkpoint WAL stores
    it instead of a Datastore entity.  Each micro-batch emits the next
    ``batch_size`` keys until ``num_entities`` is reached, then idles;
    ``readBetweenOffsets`` replays any committed range verbatim, which
    is what makes recovery exactly-once."""

    def __init__(self, options: dict):
        self.kind = options.get("kind", "entity")
        self.namespace = options.get("namespace", "default")
        self.num_entities = int(options.get("num_entities", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"key": 0}

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        # a list_iterator (picklable, so the prefetch cache can replay
        # it), NOT a bare list: once the feed idles (start == end) the
        # SimpleStreamReader wrapper probes emptiness with next(it),
        # which a list does not support
        return iter([
            (key, self.kind, self.namespace, f"{self.kind}-{key:08d}")
            for key in range(start, end)
        ])

    def read(self, start: dict):
        s = int(start["key"])
        e = min(s + self.batch_size, self.num_entities)
        return self._rows(s, e), {"key": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["key"]), int(end["key"]))




class EntityCommit(WriterCommitMessage):
    """One task's commit message: the staged file it produced."""

    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class EntityWriter(DataSourceArrowWriter):
    """Two-phase-commit entity sink — the write half of the simulated
    Datastore connector (the reference's mutation-pool PUT path,
    SURVEY §2.A A7/A8 output surface).

    Each task stages its partition as a JSON-lines file under
    ``<path>/_staging/`` and reports it in a commit message; only the
    driver-side ``commit`` — which runs exactly once, after ALL tasks
    succeed — moves staged files into the destination.  A failed or
    speculative task's output is never visible, and ``abort`` removes
    every staged file: task-retry-safe exactly-once, the same contract
    a real connector gets from Datastore transactions.

    r16: the write path is Arrow-batched (``DataSourceArrowWriter``):
    rows arrive as ``pyarrow.RecordBatch`` and each batch is rendered
    to JSON-lines by pandas' C serializer in one call — the previous
    row-at-a-time ``json.dumps(row.asDict())`` loop paid the
    pickled-Row boundary plus a Python dict + dumps per entity
    (guide §4: batch the boundary, vectorize the body).  The staged
    file format and the two-phase commit are unchanged."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("datastore_entity writer requires option 'path'")

    def write(self, iterator) -> "EntityCommit":
        import os
        import uuid

        from pyspark import TaskContext

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        pid = TaskContext.get().partitionId()
        staged = os.path.join(staging, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                # one C-level JSON-lines render per Arrow batch;
                # ensure_ascii/escaping semantics match json.dumps
                txt = batch.to_pandas().to_json(
                    orient="records", lines=True, force_ascii=True)
                if not txt.endswith("\n"):
                    txt += "\n"
                f.write(txt)
                n += batch.num_rows
        return EntityCommit(staged, n)

    def commit(self, messages) -> None:
        import os
        import shutil

        os.makedirs(self.path, exist_ok=True)
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.staged_path))
            shutil.move(m.staged_path, dest)
        staging = os.path.join(self.path, "_staging")
        shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import os
        import shutil

        for m in messages:
            try:
                os.remove(m.staged_path)
            except OSError:
                pass
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)
