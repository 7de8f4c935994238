"""Plan introspection — tools to verify the engine gets the physical
plans it was designed for (pushdown, pruning, broadcast, top-k)."""

from .explain import formatted, has_operator, scan_info  # noqa: F401
