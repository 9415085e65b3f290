"""Maximum-clique correspondence pruning: native C++ exact solver + JAX
device-side heuristic.

Parity with the reference's ctypes wrapper (/root/reference/utils/max_clique.py
:14-40 — whose libpmc.so binary is NOT shipped): same `pmc(ei, ej, nnodes,
nnedges)` entry point and same C ABI. The shared object builds on demand from
native/max_clique.cpp with g++ (cached next to the source).

Exact branch-and-bound doesn't map to XLA, so `max_clique_heuristic_jax`
provides a device-friendly alternative (iterated weighted-degree peeling on
the consistency-graph adjacency) usable inside jit for on-TPU pruning.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np
from numpy.ctypeslib import ndpointer

_SRC = os.path.join(os.path.dirname(__file__), "max_clique.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libpmc.so")


def build_library(force: bool = False) -> str:
    """Compile max_clique.cpp → libpmc.so (g++ -O3), cached by mtime."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
        check=True)
    return _LIB


@lru_cache(maxsize=1)
def _load():
    lib = ctypes.cdll.LoadLibrary(build_library())
    fun = lib.max_clique
    fun.restype = ctypes.c_int32
    fun.argtypes = [
        ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
    ]
    return fun


def max_clique(ei: np.ndarray, ej: np.ndarray, n_nodes: int) -> np.ndarray:
    """Exact maximum clique of the undirected edge list → vertex ids."""
    ei = np.ascontiguousarray(ei, np.int32)
    ej = np.ascontiguousarray(ej, np.int32)
    outsize = max(n_nodes, 1)
    output = np.zeros(outsize, np.int32)
    size = _load()(len(ei), ei, ej, 0, outsize, output)
    return output[:size].copy()


def pmc(ei, ej, nnodes, nnedges) -> np.ndarray:
    """Reference-named entry point (utils/max_clique.py:14)."""
    ei = np.asarray(ei, np.int32)[:nnedges]
    ej = np.asarray(ej, np.int32)[:nnedges]
    return max_clique(ei, ej, nnodes)


def consistency_graph(src_pts: np.ndarray, tgt_pts: np.ndarray,
                      tau: float = 0.10) -> tuple[np.ndarray, np.ndarray]:
    """Pairwise length-consistency edges between putative correspondences:
    (i, j) connected iff |‖sᵢ−sⱼ‖ − ‖tᵢ−tⱼ‖| < tau — the classic rigid-
    consistency test the clique step prunes with."""
    ds = np.linalg.norm(src_pts[:, None] - src_pts[None], axis=-1)
    dt = np.linalg.norm(tgt_pts[:, None] - tgt_pts[None], axis=-1)
    ok = np.abs(ds - dt) < tau
    np.fill_diagonal(ok, False)
    ei, ej = np.nonzero(np.triu(ok))
    return ei.astype(np.int32), ej.astype(np.int32)


def max_clique_heuristic_jax(adj, iters: int = 16):
    """Device-side clique heuristic: iterative weighted-degree peeling.

    adj: [N, N] float adjacency (symmetric, zero diagonal) of the consistency
    graph. Returns a {0,1} mask [N] of a (near-)clique: repeatedly drop the
    active vertex least connected to the rest until the survivors are mutually
    consistent. Fixed iteration count → static shapes, jit/vmap-safe.
    """
    import jax.numpy as jnp
    import jax

    n = adj.shape[-1]
    mask0 = jnp.ones(adj.shape[:-1], adj.dtype)

    def body(_, mask):
        active = jnp.sum(mask, axis=-1, keepdims=True)
        deg = jnp.einsum("...ij,...j->...i", adj, mask) * mask
        # survivors fully connected? degree == active-1 for all active
        complete = jnp.all((deg >= active - 1.0) | (mask == 0), axis=-1,
                           keepdims=True)
        worst = jnp.argmin(jnp.where(mask > 0, deg, jnp.inf), axis=-1)
        drop = jax.nn.one_hot(worst, n, dtype=mask.dtype)
        return jnp.where(complete, mask, mask * (1.0 - drop))

    import jax.lax as lax
    return lax.fori_loop(0, iters, body, mask0)
