"""ctypes bindings for the native C++ alpha-expansion parity solver.

The reference's discrete optimizer is the vendored C++ gco-v3.0
(SURVEY.md §2 C10/C11). The TPU pipeline replaces it with mean-field/ICM;
this module loads our from-scratch C++ expansion solver (native/
expansion.cpp) used as the *parity oracle*: golden-label generation and
label-agreement validation of the TPU relaxation (BASELINE.json:5 "within
0.5% misclassification").

Built on demand with g++ (this image has no pybind11; plain C ABI +
ctypes per the environment contract).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "expansion.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libexpansion.so")

_lib = None


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-Wall",
         _SRC, "-o", _SO],
        check=True, capture_output=True,
    )


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.expansion_solve.restype = ctypes.c_double
    lib.expansion_solve.argtypes = [
        ctypes.c_int32,                                   # n
        ctypes.c_int32,                                   # L
        np.ctypeslib.ndpointer(np.float64, flags="C"),    # data_costs
        ctypes.c_int32,                                   # n_edges
        np.ctypeslib.ndpointer(np.int32, flags="C"),      # edge_pq
        np.ctypeslib.ndpointer(np.float64, flags="C"),    # edge_w
        ctypes.c_double,                                  # lambda
        np.ctypeslib.ndpointer(np.float64, flags="C"),    # label_costs
        np.ctypeslib.ndpointer(np.int32, flags="C"),      # init_labels
        ctypes.c_int32,                                   # max_cycles
        np.ctypeslib.ndpointer(np.int32, flags="C"),      # out_labels
    ]
    _lib = lib
    return lib


def expansion_solve(
    data_costs: np.ndarray,
    edge_pq: np.ndarray,
    edge_w: np.ndarray,
    spatial_weight: float,
    label_costs: np.ndarray,
    init_labels: np.ndarray | None = None,
    max_cycles: int = 10,
):
    """Minimize E(L) = sum D[p,L(p)] + lambda/2 * sum_directed w[L(p)!=L(q)]
    + sum_{used l} h_l via alpha-expansion with label costs.

    Args:
      data_costs: (N, L) float64.
      edge_pq: (E, 2) int32 directed edges (both directions of the k-NN
        graph, exactly as multih_tpu's symmetrized energy counts them).
      edge_w: (E,) float64 edge weights.
      spatial_weight: lambda.
      label_costs: (L,) float64 per-label cost (0 to disable).
      init_labels: (N,) int32 start labeling (default: per-point argmin).

    Returns:
      (labels (N,) int32, energy float)
    """
    lib = load()
    d = np.ascontiguousarray(data_costs, np.float64)
    n, L = d.shape
    pq = np.ascontiguousarray(edge_pq, np.int32).reshape(-1, 2)
    w = np.ascontiguousarray(edge_w, np.float64).reshape(-1)
    assert pq.shape[0] == w.shape[0]
    h = np.ascontiguousarray(label_costs, np.float64)
    assert h.shape == (L,)
    if init_labels is None:
        init_labels = d.argmin(axis=1).astype(np.int32)
    init = np.ascontiguousarray(init_labels, np.int32)
    out = np.empty(n, np.int32)
    e = lib.expansion_solve(
        n, L, d, pq.shape[0], pq, w, float(spatial_weight), h, init,
        int(max_cycles), out,
    )
    return out, float(e)
