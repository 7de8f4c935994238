"""The ACID-lite CHANGE DATA FEED as a Structured Streaming SOURCE.

``sources/acid_stream.py`` streams the table's APPEND deltas
(versions as offsets, one task per added file) but refuses any
non-append commit; ``acid_lite.change_data_feed`` computes row-level
deltas for ANY commit kind but only as a batch.  This module is the
composition the round-14 VERDICT asked for (task 3) — Delta's
``readChangeFeed`` streaming mode: update/delete deltas stream
downstream, so an incremental consumer (an IVM view refresh, a
CDC-to-warehouse hop) is a streaming pipeline instead of a scheduled
batch diff.

Semantics: POSITIONAL CDF, the delta a position-delete format can
produce without persisted row lineage (see ``update_where_mor``'s
contract, `acid_lite.py`):

* files ADDED in ``(start, end]`` emit their live rows as ``insert``
  (positions already dead under the range's new deletion vectors are
  suppressed — a row appended and DV-deleted inside one batch never
  existed downstream);
* files REMOVED emit the rows that were live at ``start`` as
  ``delete`` (positions dead under ``start``'s vectors were gone
  before the range and stay silent);
* NEW deletion-vector positions on CARRIED files emit those rows as
  ``delete`` — this is how ``delete_where_dv`` surfaces, and an
  ``update_where_mor`` surfaces as its DV ``delete`` plus its
  appended-image ``insert`` in the same micro-batch.

For merge-on-read commits (append / ``delete_where_dv`` /
``update_where_mor``) the positional feed is EXACT — no file is ever
rewritten, so no carried-row noise exists.  Copy-on-write rewrites
(merge, CoW delete, replace) stream their full file delta:
delete+insert pairs that include co-located carried rows.  Applied
to a keyed sink the net effect is still correct (delete-then-upsert
is idempotent on carried rows), matching Delta CDF's behavior on
tables without CDC change files.  ``optimize`` (a pure re-layout
plus DV purge) is refused mid-stream: its dropped vectors would
resurrect positions on files the rewrite replaced — the guard below
detects any dropped vector touching a carried file and raises.

Scale posture: offsets are table versions (driver-side manifest
math); each micro-batch plans one executor task per touched file;
the only row-shaped thing the driver reads is the ``rel`` column of
the range's NEW deletion-vector sidecars (to route DV deletes to
carried-file tasks) — bounded by the range's deleted-row count,
never table-sized.  Tasks open exactly one immutable parquet file
plus the (small) sidecars with pyarrow, executor-side.

Pacing: option ``versions_per_batch`` (default 0 = drain to latest)
caps how many versions one micro-batch spans — the Delta
``maxFilesPerTrigger``-style knob that makes per-COMMIT deltas
observable instead of one telescoped endpoint diff.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import acid_lite
from .acid_stream import _ddl_field_names


def _dv_rels(paths: list[str]) -> set[str]:
    """Distinct table-relative file paths a set of deletion-vector
    sidecars targets — a column-pruned pyarrow read of just ``rel``,
    bounded by the sidecars' row count (= deleted rows)."""
    import pyarrow.parquet as pq

    rels: set[str] = set()
    for p in paths:
        rels.update(pq.read_table(p, columns=["rel"])
                    .column("rel").to_pylist())
    return rels


class CdfSlice(InputPartition):
    """One file's contribution to a micro-batch's change feed.

    kind:
      * ``insert``    — emit live rows (minus ``dv_paths`` positions)
        with ``_change_type='insert'``;
      * ``delete``    — same row selection, ``_change_type='delete'``
        (a removed file: rows live at range start);
      * ``dv_delete`` — emit ONLY the ``dv_paths`` positions, as
        ``delete`` (new vectors on a carried file).
    """

    def __init__(self, kind: str, abs_path: str, rel: str, ddl: str,
                 mapping: dict | None, dv_paths: list[str]):
        self.kind = kind
        self.abs_path = abs_path
        self.rel = rel
        self.ddl = ddl
        self.mapping = mapping or {}
        self.dv_paths = dv_paths


class AcidCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("acid_cdf source requires option 'path'")
        self.start_v = int(options.get("starting_version", 0))
        self.vpb = int(options.get("versions_per_batch", 0))
        # pacing high-water.  The Python DataSource API has no
        # admission-control hook, so ``versions_per_batch`` pacing
        # must carry its own watermark: a paced latestOffset that
        # RESTARTS from scratch would return an offset BELOW the
        # engine's checkpointed commit, and the engine (which only
        # compares offsets for equality) would re-plan the already-
        # drained range under a NEW batch id — duplicating rows past
        # the sink's batch-id dedup.  ``pacing_dir`` (point it at the
        # checkpoint dir) makes the watermark survive restarts;
        # without it, pacing is single-run (documented).
        self._pace_file = None
        pd_ = options.get("pacing_dir")
        if pd_ and self.vpb > 0:
            os.makedirs(pd_, exist_ok=True)
            self._pace_file = os.path.join(pd_, "acid_cdf_pacing.json")
        self._emitted: int | None = self._load_hw()

    def _load_hw(self) -> int | None:
        if self._pace_file and os.path.exists(self._pace_file):
            import json

            with open(self._pace_file) as f:
                return int(json.load(f)["high_water"])
        return None

    def _save_hw(self, v: int) -> None:
        if self._pace_file:
            import json

            with open(self._pace_file, "w") as f:
                json.dump({"high_water": v}, f)

    def initialOffset(self) -> dict:
        return {"version": self.start_v}

    def latestOffset(self) -> dict:
        latest = acid_lite.latest_version(self.path)
        if self.vpb <= 0:
            return {"version": latest}
        base = self._emitted if self._emitted is not None else self.start_v
        nxt = min(latest, base + self.vpb)
        if nxt > base:
            self._emitted = nxt
            self._save_hw(nxt)
            return {"version": nxt}
        return {"version": base}

    def partitions(self, start: dict, end: dict) -> Sequence[CdfSlice]:
        s, e = int(start["version"]), int(end["version"])
        if e <= s:
            return []
        e_m = acid_lite._read_manifest(self.path, e)
        if e_m.get("partition_by"):
            raise ValueError(
                "acid_cdf streaming source does not support partitioned "
                "tables (per-file tasks cannot re-attach partition "
                "columns) — use batch change_data_feed"
            )
        s_m = acid_lite._read_manifest(self.path, s) if s else None
        s_files = list(s_m["files"]) if s_m else []
        sset, eset = set(s_files), set(e_m["files"])
        s_dvs = list(s_m.get("dvs") or []) if s_m else []
        e_dvs = list(e_m.get("dvs") or [])
        new_dvs = [os.path.join(self.path, d)
                   for d in e_dvs if d not in set(s_dvs)]
        dropped_dvs = [os.path.join(self.path, d)
                       for d in s_dvs if d not in set(e_dvs)]
        # a vector DROPPED while its file is carried would resurrect
        # positions (only optimize purges vectors, and it rewrites
        # the files too — so this fires only on a range that spans an
        # OPTIMIZE, which positional CDF cannot represent)
        if dropped_dvs:
            resurrected = _dv_rels(dropped_dvs) & (sset & eset)
            if resurrected:
                raise ValueError(
                    f"versions ({s}, {e}] dropped deletion vectors on "
                    f"{len(resurrected)} carried file(s) (an OPTIMIZE "
                    "inside the range) — restart the feed past it or "
                    "use batch change_data_feed"
                )
        new_dv_rels = _dv_rels(new_dvs) if new_dvs else set()
        ddl = e_m["schema"]
        s_ddl = s_m["schema"] if s_m else ddl
        mapping = e_m.get("mapping")
        s_mapping = s_m.get("mapping") if s_m else mapping
        out: list[CdfSlice] = []
        for f in e_m["files"]:
            ap = os.path.join(self.path, f)
            if f not in sset:        # added: live rows insert
                out.append(CdfSlice(
                    "insert", ap, f, ddl, mapping,
                    new_dvs if f in new_dv_rels else []))
            elif f in new_dv_rels:   # carried + newly-dead positions
                out.append(CdfSlice(
                    "dv_delete", ap, f, ddl, mapping, new_dvs))
        for f in s_files:
            if f not in eset:        # removed: rows live at start
                out.append(CdfSlice(
                    "delete", os.path.join(self.path, f), f, s_ddl,
                    s_mapping,
                    [os.path.join(self.path, d) for d in s_dvs]))
        return out

    def read(self, partition: CdfSlice) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        names = _ddl_field_names(partition.ddl)
        tbl = pq.read_table(partition.abs_path)
        positions: set[int] = set()
        for d in partition.dv_paths:
            dv = pq.read_table(d, columns=["rel", "row_index"])
            rels = dv.column("rel").to_pylist()
            ris = dv.column("row_index").to_pylist()
            positions.update(
                ri for r, ri in zip(rels, ris) if r == partition.rel)
        cols = []
        for n in names:
            phys = partition.mapping.get(n, n)
            if phys in tbl.column_names:
                cols.append(tbl.column(phys).to_pylist())
            else:   # schema-evolution column absent from an old file
                cols.append([None] * tbl.num_rows)
        if partition.kind == "dv_delete":
            idx = sorted(p for p in positions if p < tbl.num_rows)
            ct = "delete"
        else:
            idx = [i for i in range(tbl.num_rows) if i not in positions]
            ct = "insert" if partition.kind == "insert" else "delete"
        return iter(tuple(c[i] for c in cols) + (ct,) for i in idx)

    def commit(self, end: dict) -> None:
        pass  # offsets are table versions; nothing to clean up


class AcidCdfDataSource(DataSource):
    """``spark.readStream.format("acid_cdf").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "acid_cdf"

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("acid_cdf source requires option 'path'")
        v = acid_lite.latest_version(path)
        if v == 0:
            raise ValueError(f"table does not exist: {path}")
        base = acid_lite._read_manifest(path, v)["schema"]
        return f"{base}, _change_type string"

    def streamReader(self, schema: StructType) -> AcidCdfStreamReader:
        return AcidCdfStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(AcidCdfDataSource)
