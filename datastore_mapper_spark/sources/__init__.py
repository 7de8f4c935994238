"""Sources & sinks — the engine's analogue of the reference's
Datastore input and rolled GCS/BigQuery output surface."""

from .writer import rolled_write, write_partitioned  # noqa: F401
