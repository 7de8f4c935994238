"""Allocator hygiene for heavy numpy kernels inside Python workers.

Two independent failure modes of big-buffer numpy code on this class
of host, one fix entry point:

1. **Page churn** — glibc serves allocations above M_MMAP_THRESHOLD
   (128 KB default, auto-tuned up to 32 MB) with a private mmap and
   RETURNS the pages to the OS on free.  A kernel that builds several
   50-100 MB numpy arrays per task therefore re-faults every page on
   every task.  Raising the mmap threshold and disabling trim keeps
   big buffers on the recycling heap: pages are faulted once per
   WORKER (Spark reuses Python workers by default) and every later
   allocation — same task or the next one — reuses them.

2. **THP direct compaction** — numpy madvise(MADV_HUGEPAGE)s every
   allocation >= 4 MB.  With transparent hugepages in ``madvise``
   mode the kernel then attempts a SYNCHRONOUS 2 MB-page allocation
   per fault, running direct memory compaction when physical memory
   is fragmented.  Measured on the r16 sandbox (rusage inside a
   worker): a 200 MB first-touch fill took 17.9 s of SYSTEM time with
   only 286 minor faults — ~60 ms per 2 MB THP fault — vs 0.1 s and
   ~49 k ordinary 4 KB faults with the madvise disabled.  This is the
   classic THP latency stall databases document; the fix is the
   documented numpy runtime toggle, not a root-only sysctl.  The cost
   of plain 4 KB pages is a slightly higher TLB miss rate in the
   vector loops — microseconds against intermittent 20-80 s stalls.

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
    try:
        from numpy.core import multiarray

        multiarray._set_madvise_hugepage(False)
    except Exception:
        pass
