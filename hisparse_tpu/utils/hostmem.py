"""Host allocator tuning for preprocessing throughput.

The preprocessing pipeline (formats/wavepack.py, formats/_scheduler.cpp) is
the analog of the reference's CPU-side csr2cpsr (sw/data_formatter.h:465-544)
and must hit paper-Table-8-class throughput.  On the virtualized hosts this
framework targets, *page faults dominate*, for two separate reasons:

1. numpy madvises ``MADV_HUGEPAGE`` on every large allocation (its Linux
   default).  With transparent hugepages in ``madvise`` mode these hosts
   compact synchronously on fault at ~13 MB/s — vs ~1.7 GB/s for plain 4 KiB
   faults (measured side by side; a 130x tax).  This, not raw fault cost,
   was the "fresh pages at 0.1 GB/s" mystery: a 316 MB pack-output touch
   cost ~9 s with the madvise and ~0.2 s without.
2. glibc serves every large numpy temporary via a fresh mmap and returns it
   on free, so each O(nnz) pass re-faults hundreds of MB even at the fast
   rate.
3. numpy's madvise flag does not cover every THP path (measured: a full
   pokec-scale pack still spent ~55 s first-touching its ~900 MB of output
   with the flag off; ``prctl(PR_SET_THP_DISABLE)`` cut that to ~21 s).
   With THP defrag in synchronous-on-madvise mode hugepages are a pure tax
   here, so the process opts out wholesale.

``tune_allocator()`` disables numpy's hugepage madvise, disables THP for
the whole process via prctl, and raises the glibc mmap and trim thresholds
so large allocations come from the (persistent, already-faulted) heap and
the high-water mark is reused across passes and packs.  Measured effect on
this class of host: np.sort of 27M int64 drops 19 s -> 1.9 s; first-touch
of a fresh 316 MB buffer drops 6.6 s -> 0.17 s.  Idempotent; each knob is
independently a no-op where unavailable.

4. (round-4 measurement) Beyond the fixes above there is a HOST-side
   provisioning wall: the first ~3 GB of fresh memory faults at
   1-2 GB/s, after which new physical pages arrive at only 10-100 MB/s
   (microVM ballooning; freed pages go back cold, so the budget is
   global and moving, not per-process).  Nothing in-process can speed
   that up — the countermeasure is to keep the heap HIGH-WATER at one
   working set: always drop the previous pack before building the next
   (reused heap pages stay fast) and never hold two giant packs alive
   at once.  bench.py's tuner loops do this explicitly.  A 124M-nnz
   pack has a ~13 GB working set, so its FIRST run in a process pays
   minutes of one-time provisioning regardless of algorithm.
"""
from __future__ import annotations

import ctypes

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def _disable_numpy_hugepages() -> bool:
    try:
        try:
            from numpy._core import multiarray as _ma  # numpy >= 2
        except ImportError:  # pragma: no cover - numpy 1.x
            from numpy.core import multiarray as _ma  # type: ignore
        _ma._set_madvise_hugepage(False)
        return True
    except Exception:  # pragma: no cover - API moved / absent
        return False


def tune_allocator(threshold_bytes: int = 1 << 31) -> bool:
    """Serve allocations below ``threshold_bytes`` from the persistent heap,
    never trim it back, and stop numpy from requesting hugepages.  Returns
    True if the glibc mallopt calls succeeded."""
    global _done
    if _done:
        return True
    _disable_numpy_hugepages()
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        try:
            _PR_SET_THP_DISABLE = 41
            libc.prctl(_PR_SET_THP_DISABLE, 1, 0, 0, 0)
        except Exception:  # pragma: no cover - non-Linux libc
            pass
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes) == 1)
    except (OSError, AttributeError):
        return False
    _done = ok
    return ok
