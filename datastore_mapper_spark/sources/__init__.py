"""Sources & sinks — the engine's analogue of the reference's
Datastore input and rolled GCS/BigQuery output surface."""

from .entity_source import EntityDataSource  # noqa: F401
from .reader import range_shard, read_namespaced, read_table  # noqa: F401
from .writer import rolled_write, write_partitioned  # noqa: F401
