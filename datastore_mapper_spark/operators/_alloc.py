"""Allocator hygiene for heavy numpy kernels inside Python workers.

glibc serves allocations above M_MMAP_THRESHOLD (128 KB default, auto-
tuned up to 32 MB) with a private mmap and RETURNS the pages to the OS
on free.  A kernel that builds several 50-100 MB numpy arrays per task
therefore re-faults every page on every task — and on hosts where the
kernel's fresh-page path is slow this dominates wall time (measured on
the r16 sandbox: first-touch memset of 400 MB cost 79 s of SYSTEM time
during slow phases vs 0.04 s warm; a pagerank kernel whose loop is
0.95 s of user time ran 40+ s).  Raising the mmap threshold and
disabling trim keeps big buffers on the recycling heap: pages are
faulted once per WORKER (Spark reuses Python workers by default) and
every later allocation — same task or the next one — reuses them.

Call :func:`keep_large_allocs_on_heap` once at the top of a kernel
before the first large allocation.  No-op on non-glibc platforms and
after the first call per process.  RSS stays bounded by the worker's
true peak, which the kernel-envelope routers already cap.
"""

from __future__ import annotations

_done = False


def keep_large_allocs_on_heap() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass
