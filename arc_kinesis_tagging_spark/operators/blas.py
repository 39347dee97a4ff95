"""Runtime BLAS thread control for tiny driver-side linear algebra.

Bounded model training (OPQ's alternating Lloyd/Procrustes, PQ
codebooks, PCA on a d x d Gram) runs DRIVER-SIDE on sample-sized
matrices (n<=512, d<=64). numpy's bundled OpenBLAS splits even these
across its worker threads, and the fork/join synchronization dwarfs
the arithmetic: on this container a 512x64 @ 64x64 GEMM measures
~5.1 ms threaded vs ~0.47 ms single-threaded (11x), and a 64x64 SVD
2.3 ms vs 1.0 ms. That threading penalty is also host-scheduler
dependent, which made the round-9 q_similarity_opq bench number move
with NO code change — the round-10 root cause.

``single_thread_blas()`` pins the already-loaded OpenBLAS to one
thread for the duration of a training block and restores the previous
setting after. It is deliberately scoped: executor-side Arrow kernels
(the actual data path) never call it — only bounded driver-side
training loops where the matrices are tiny by design. Resolution is
best-effort via the process's own loaded libraries; if no OpenBLAS
symbol is found (different BLAS, static link), the context manager is
a no-op and correctness is unaffected.
"""

from __future__ import annotations

import ctypes
from contextlib import contextmanager

_LIB = None
_GET = None
_SET = None
_RESOLVED = False


def _resolve() -> None:
    global _LIB, _GET, _SET, _RESOLVED
    if _RESOLVED:
        return
    _RESOLVED = True
    try:
        paths = []
        with open("/proc/self/maps") as fh:
            for line in fh:
                part = line.split()[-1]
                if "openblas" in part.lower() and part not in paths:
                    paths.append(part)
        for p in paths:
            lib = ctypes.CDLL(p)
            for suffix in ("64_", ""):
                set_name = f"openblas_set_num_threads{suffix}"
                get_name = f"openblas_get_num_threads{suffix}"
                if hasattr(lib, set_name):
                    _LIB = lib
                    _SET = getattr(lib, set_name)
                    _GET = getattr(lib, get_name, None)
                    if _GET is not None:
                        _GET.restype = ctypes.c_int
                    return
    except OSError:  # /proc unavailable (non-Linux) or dlopen refusal
        pass


@contextmanager
def single_thread_blas():
    """Pin OpenBLAS to 1 thread inside the block; restore on exit.

    No-op when the process's BLAS cannot be resolved. NOT thread-safe
    against concurrent driver threads doing large BLAS work — use only
    around bounded, driver-side training loops.
    """
    _resolve()
    # BOTH symbols must resolve: with a setter but no getter we could
    # pin to 1 thread but never restore, permanently degrading
    # process-wide BLAS after the block — treat that as unresolvable.
    if _SET is None or _GET is None:
        yield
        return
    prev = _GET()
    _SET(1)
    try:
        yield
    finally:
        if prev is not None and prev > 0:
            _SET(prev)
