"""Host heap pre-faulting for sandboxed/virtualized machines.

Some sandboxed hosts fault in fresh anonymous pages at ~MB/s, which makes
every *first* large numpy allocation (and only the first touch) hundreds
of times slower than the actual arithmetic.  With glibc's
``MALLOC_MMAP_MAX_=0`` (large allocations served from the brk heap, so
freed pages are reused instead of unmapped) a single warm-up pass over a
big buffer moves every later allocation under that watermark onto
already-faulted pages.

``ensure_fast_heap()`` re-execs the interpreter once with the required
environment (the variables are read at the first malloc, so setting them
in-process is too late) and pre-faults the requested arena.  It is a
no-op on healthy hosts beyond a few ms of memset.
"""

from __future__ import annotations

import os
import sys

_ENV = {"MALLOC_MMAP_MAX_": "0", "MALLOC_TRIM_THRESHOLD_": "-1"}
_FLAG = "_AMGCL_TPU_HEAP_REEXEC"


def prefault(nbytes: int = 2 << 30) -> None:
    """Touch nbytes of heap once so later allocations reuse warm pages."""
    import numpy as np

    chunk = np.empty(nbytes // 8, dtype=np.float64)
    chunk[:: 4096 // 8] = 0.0          # one store per page
    del chunk


def ensure_fast_heap(nbytes: int = 0) -> None:
    """Re-exec once with the malloc env set; optionally pre-fault.

    Faulting runs at ~10 MB/s on the affected hosts regardless of thread
    count, so the default is env-only: each heap high-water mark is paid
    once (as it would be anyway) and every later allocation cycle reuses
    warm pages.  Pass nbytes to eagerly pre-fault when a known-size
    workload follows and the one-time cost is acceptable.

    Call at the top of long-running entry points (bench, CLI) BEFORE
    importing numpy-heavy modules.  Safe to call multiple times.
    """
    if all(os.environ.get(k) == v for k, v in _ENV.items()):
        if nbytes and not os.environ.get(_FLAG + "_DONE"):
            os.environ[_FLAG + "_DONE"] = "1"
            prefault(nbytes)
        return
    if os.environ.get(_FLAG):          # avoid exec loops
        return
    if not sys.argv or sys.argv[0] in ("-", "-c", ""):
        return                          # stdin/-c scripts can't re-exec
    env = dict(os.environ, **_ENV)
    env[_FLAG] = "1"
    try:
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    except OSError:
        pass                            # keep running without the fix
