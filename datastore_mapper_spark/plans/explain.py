"""Physical-plan introspection helpers.

The engine does no custom planning (SURVEY §4.2: zero custom Catalyst
rules needed) — its performance contract is that the *declarative*
query shapes reliably produce the right built-in physical plans.
These helpers make that contract testable (tests/test_plans.py), the
engine-side analogue of eyeballing ``df.explain('formatted')``:

- filters/projections must reach the parquet scan (A3/A4 ≙ Datastore
  index scans / keys-only queries);
- small dims must broadcast (no fact-table shuffle);
- top-k must plan TakeOrderedAndProject (no global sort);
- per-group top-n must plan WindowGroupLimit (rank pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of a DataFrame's physical plan."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def has_operator(df: DataFrame, op_name: str) -> bool:
    """True if the physical plan contains ``op_name`` (substring match
    on plan node names, e.g. 'BroadcastHashJoin', 'TakeOrderedAndProject')."""
    return op_name in formatted(df)


def scan_info(df: DataFrame) -> dict[str, list[str]]:
    """PushedFilters / ReadSchema lines for every scan in the plan."""
    out: dict[str, list[str]] = {"PushedFilters": [], "ReadSchema": []}
    for line in formatted(df).splitlines():
        line = line.strip()
        for key in out:
            if line.startswith(key):
                out[key].append(line[len(key) + 1 :].strip())
    return out


def scan_output_rows(df: DataFrame) -> int:
    """Total ``number of output rows`` across the executed plan's file
    scans.  Must be called AFTER an action materialized the metrics.
    Parquet row-group statistics filter at the scan, so a selective
    predicate over a SORTED-on-write layout shows far fewer scan
    output rows than the same predicate over a shuffled layout — the
    measurable form of the sort-on-write data-layout lever."""
    plan = df._jdf.queryExecution().executedPlan()
    total = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        if node.nodeName().startswith("Scan"):
            metrics = node.metrics()
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total += kv._2().value()
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    return total
