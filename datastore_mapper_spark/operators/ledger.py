"""Stateful per-key sequential-scan operators (the applyInPandas tier).

Some recurrences are NON-ASSOCIATIVE — a clamped (saturating) running
balance ``b_i = clamp(b_{i-1} + delta_i, 0, cap)`` cannot be folded
into any window aggregate, because clamping destroys the associativity
every partial-aggregation strategy relies on.  Spark's built-in
surface has no such operator, so this is the documented tier-(b)
escape hatch (SURVEY §2 custom-operator policy): an Arrow-batched
grouped scan via ``applyInPandas`` — one group is one key's full
ordered history, the kernel is a tight integer loop, and nothing is
ever collected to the driver.

100 TB notes: per-key history must fit an executor's memory for the
grouped scan; keys with unbounded histories are re-keyed by
``(key, epoch)`` and the per-epoch carry-out balances are chained with
a second (tiny, |keys|-sized) sequential pass — the classic two-level
scan.  In streaming, the same kernel runs under
``applyInPandasWithState`` with the balance as the state row
(streaming/stateful.py shows the state plumbing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: Saturation ceiling for the contract query, in integer cents —
#: integer state keeps the recurrence exact on every engine.
CAP_CENTS = 50_000


def clamped_balance_kernel(
    deltas: np.ndarray, cap: int = CAP_CENTS, start: int = 0
) -> np.ndarray:
    """The sequential recurrence: ``b_i = min(cap, max(0, b_{i-1} + d_i))``.

    Pure-numpy int64 in/out so it is unit-testable (hypothesis drives
    it against the obvious reference loop) and reusable by both the
    batch grouped scan and a streaming state handler.  ``start`` is
    the carry-in balance for the two-level chained scan.
    """
    out = np.empty(len(deltas), dtype=np.int64)
    b = int(start)
    for i, d in enumerate(deltas):
        b = b + int(d)
        if b < 0:
            b = 0
        elif b > cap:
            b = cap
        out[i] = b
    return out


def capped_running_balance(
    keyed: DataFrame,
    cap: int = CAP_CENTS,
    key: str = "user_id",
    order: tuple[str, str] = ("us", "event_id"),
    delta: str = "delta",
) -> DataFrame:
    """Clamped running balance per key as an Arrow grouped scan.

    ``keyed`` must carry ``key``, the two ``order`` columns (exact
    integers — ordering floats would re-introduce comparison seams),
    and the integer ``delta`` column.  Returns one row per input row:
    ``(key, rn, balance)`` with ``rn`` the 1-based position in the
    ordered history.  Grouping does NOT imply order, so the kernel
    sorts each group on the order columns itself.
    """
    o1, o2 = order

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([o1, o2], kind="mergesort")
        bal = clamped_balance_kernel(
            pdf[delta].to_numpy(dtype=np.int64), cap=cap
        )
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy(dtype=np.int64),
                "rn": np.arange(1, len(bal) + 1, dtype=np.int64),
                "balance": bal,
            }
        )

    return keyed.groupBy(key).applyInPandas(
        _scan, schema=f"{key} long, rn long, balance long"
    )
