"""ctypes loader for the optional C++ kernels (native/rerank.cpp).

The k-reciprocal expansion loop is O(N * k1^2) pointer-chasing that numpy
can't vectorize; the C++ kernel gives ~20-50x on it. Falls back to numpy
silently when the shared object hasn't been built (build with
``python -m openibl_tpu.ops._native`` or ``make -C native``).
"""

import ctypes
import os.path as osp
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_ROOT, "native", "rerank.cpp")
_SO = osp.join(_ROOT, "native", "librerank.so")


def build(verbose=False):
    """Compile native/rerank.cpp → librerank.so with g++."""
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return _SO


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    needs_build = osp.exists(_SRC) and (
        not osp.exists(_SO) or osp.getmtime(_SO) < osp.getmtime(_SRC)
    )
    if needs_build:  # also rebuilds a stale ABI after source changes
        try:
            build()
        except Exception:
            return None
    if not osp.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.expansion_weights.restype = ctypes.c_int64
        lib.expansion_weights.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # original (n*n)
            ctypes.POINTER(ctypes.c_int32),  # initial_rank (n*rank_cols)
            ctypes.c_int64,  # n
            ctypes.c_int64,  # rank_cols
            ctypes.c_int32,  # k1
            ctypes.c_int32,  # half (np.around(k1/2), python is the source of truth)
            ctypes.POINTER(ctypes.c_int32),  # out rows (cap)
            ctypes.POINTER(ctypes.c_int32),  # out cols (cap)
            ctypes.POINTER(ctypes.c_float),  # out vals (cap)
            ctypes.c_int64,  # cap
        ]
        lib.expansion_sets.restype = ctypes.c_int64
        lib.expansion_sets.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # initial_rank (n*rank_cols)
            ctypes.c_int64,  # n
            ctypes.c_int64,  # rank_cols
            ctypes.c_int32,  # k1
            ctypes.c_int32,  # half
            ctypes.POINTER(ctypes.c_int32),  # out rows (cap)
            ctypes.POINTER(ctypes.c_int32),  # out cols (cap)
            ctypes.c_int64,  # cap
        ]
        lib.jaccard_queries.restype = None
        lib.jaccard_queries.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # csr indptr (n+1)
            ctypes.POINTER(ctypes.c_int32),  # csr cols (nnz)
            ctypes.POINTER(ctypes.c_float),  # csr vals (nnz)
            ctypes.POINTER(ctypes.c_int64),  # csc indptr (n+1)
            ctypes.POINTER(ctypes.c_int32),  # csc rows (nnz)
            ctypes.POINTER(ctypes.c_float),  # csc vals (nnz)
            ctypes.c_int64,  # n
            ctypes.POINTER(ctypes.c_int64),  # query rows (n_q)
            ctypes.c_int64,  # n_q
            ctypes.c_int32,  # n_threads (<=0: hardware concurrency)
            ctypes.POINTER(ctypes.c_float),  # out (n_q, n)
        ]
        _LIB = lib
    except (OSError, AttributeError):
        # OSError: dlopen failure. AttributeError: a prebuilt librerank.so
        # missing a newer symbol (e.g. tar-deployed checkout with preserved
        # mtimes skipping the staleness rebuild) — fall back to numpy/scipy
        # rather than crashing every rerank call.
        _LIB = None
    return _LIB


def available():
    return _load() is not None


def expansion_weights(original, initial_rank, k1):
    """C++ path for ops.rerank step 2+3. Returns (rows, cols, vals).

    initial_rank may be a partial (n, depth) ranking, depth >= k1+1."""
    lib = _load()
    n = original.shape[0]
    rank_cols = initial_rank.shape[1]
    assert rank_cols >= k1 + 1, "partial ranking too shallow for k1"
    original = np.ascontiguousarray(original, np.float32)
    initial_rank = np.ascontiguousarray(initial_rank, np.int32)
    # np.around rounds half-to-even (12 for k1=25); passed to C++ so both
    # paths and the cap computation agree
    half = int(np.around(k1 / 2.0))
    cap = n * (k1 + 1) * (half + 2)
    rows = np.empty(cap, np.int32)
    cols = np.empty(cap, np.int32)
    vals = np.empty(cap, np.float32)
    count = lib.expansion_weights(
        original.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        initial_rank.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, rank_cols, k1, half,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
    )
    if count < 0:
        raise RuntimeError("native expansion_weights overflow")
    return rows[:count], cols[:count], vals[:count]


def expansion_sets(initial_rank, k1):
    """C++ path for the k-reciprocal expansion index alone (no distance
    values — the streaming rerank computes weights from features).
    Returns (rows, cols), row-major sorted."""
    lib = _load()
    n = initial_rank.shape[0]
    rank_cols = initial_rank.shape[1]
    assert rank_cols >= k1 + 1, "partial ranking too shallow for k1"
    initial_rank = np.ascontiguousarray(initial_rank, np.int32)
    half = int(np.around(k1 / 2.0))
    cap = n * (k1 + 1) * (half + 2)
    rows = np.empty(cap, np.int32)
    cols = np.empty(cap, np.int32)
    count = lib.expansion_sets(
        initial_rank.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, rank_cols, k1, half,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
    )
    if count < 0:
        raise RuntimeError("native expansion_sets overflow")
    return rows[:count], cols[:count]


def jaccard_queries(csr_indptr, csr_cols, csr_vals, csc_indptr, csc_rows,
                    csc_vals, n, query_rows, n_threads=0):
    """C++ path for the re_ranking step-5 min/sum intersection.

    CSR/CSC of the same sparse V matrix (int64 indptrs, int32 indices, f32
    values); returns (len(query_rows), n) f32 Jaccard distances. Parallel
    over queries (n_threads<=0: hardware concurrency)."""
    lib = _load()
    csr_indptr = np.ascontiguousarray(csr_indptr, np.int64)
    csr_cols = np.ascontiguousarray(csr_cols, np.int32)
    csr_vals = np.ascontiguousarray(csr_vals, np.float32)
    csc_indptr = np.ascontiguousarray(csc_indptr, np.int64)
    csc_rows = np.ascontiguousarray(csc_rows, np.int32)
    csc_vals = np.ascontiguousarray(csc_vals, np.float32)
    query_rows = np.ascontiguousarray(query_rows, np.int64)
    out = np.empty((len(query_rows), n), np.float32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.jaccard_queries(
        csr_indptr.ctypes.data_as(i64p), csr_cols.ctypes.data_as(i32p),
        csr_vals.ctypes.data_as(f32p), csc_indptr.ctypes.data_as(i64p),
        csc_rows.ctypes.data_as(i32p), csc_vals.ctypes.data_as(f32p),
        n, query_rows.ctypes.data_as(i64p), len(query_rows),
        int(n_threads), out.ctypes.data_as(f32p),
    )
    return out


if __name__ == "__main__":
    print(build(verbose=True))
