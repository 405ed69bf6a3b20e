"""ctypes binding for the native Plackett-Luce MM engine
(native/plackett_luce.cpp). See burn_ppo_tpu/native/__init__.py for the
build strategy; burn_ppo_tpu/selfplay/plackett_luce.py holds the
pure-Python reference implementation and dispatches here when the
library loads."""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from burn_ppo_tpu.native import load_library

_lib = None
_lib_checked = False


def _get_lib():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    lib = load_library("plackett_luce")
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.pl_compute.restype = ctypes.c_int
    lib.pl_compute.argtypes = [
        ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, f64p,
        i32p, ctypes.c_int32,
        f64p,  # init_gammas (nullable warm start)
        ctypes.c_int32, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        f64p, f64p, i32p, f64p, i32p,
        f64p,  # out_gammas (raw centered MM gammas)
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def compute(
    num_players: int,
    comparisons,  # Sequence[_Comparison] | ComparisonArrays
    games_played: np.ndarray,
    anchor_idx: int,
    max_iterations: int,
    convergence_threshold: float,
    epsilon: float,
    anchor_elo: float,
    ci_inflation: float,
    init_gammas: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, int, float, bool, np.ndarray]]:
    """Run the native engine; None when the library is unavailable.

    Returns (ratings, uncertainties, iterations, final_delta, converged,
    gammas) — gammas are the raw centered MM values, the correct warm
    start for the next solve (ratings are NOT invertible back to gammas:
    zero-game players report the anchor placeholder, rating_history.rs
    reported-rating semantics).
    """
    lib = _get_lib()
    if lib is None:
        return None

    C = len(comparisons)
    if hasattr(comparisons, "winners"):  # ComparisonArrays fast path
        winners = np.ascontiguousarray(comparisons.winners, dtype=np.int32)
        offsets = np.zeros(C + 1, dtype=np.int32)
        np.cumsum(comparisons.counts, out=offsets[1:])
        losers = np.ascontiguousarray(comparisons.losers, dtype=np.int32)
        weights = np.ascontiguousarray(comparisons.weights, dtype=np.float64)
    else:
        winners = np.fromiter(
            (c.winner for c in comparisons), dtype=np.int32, count=C
        )
        offsets = np.zeros(C + 1, dtype=np.int32)
        for i, c in enumerate(comparisons):
            offsets[i + 1] = offsets[i] + len(c.losers)
        losers = np.empty(int(offsets[-1]), dtype=np.int32)
        for i, c in enumerate(comparisons):
            losers[offsets[i] : offsets[i + 1]] = c.losers
        weights = np.fromiter(
            (c.weight for c in comparisons), dtype=np.float64, count=C
        )
    gp = np.ascontiguousarray(games_played, dtype=np.int32)

    ratings = np.zeros(num_players, dtype=np.float64)
    uncertainties = np.zeros(num_players, dtype=np.float64)
    gammas = np.zeros(num_players, dtype=np.float64)
    iters = ctypes.c_int32(0)
    delta = ctypes.c_double(0.0)
    converged = ctypes.c_int32(0)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    if init_gammas is not None:
        ig = np.ascontiguousarray(init_gammas, dtype=np.float64)
        if ig.shape[0] != num_players:
            ig = None
    else:
        ig = None
    rc = lib.pl_compute(
        num_players, C,
        ptr(winners, ctypes.c_int32), ptr(offsets, ctypes.c_int32),
        ptr(losers, ctypes.c_int32), ptr(weights, ctypes.c_double),
        ptr(gp, ctypes.c_int32), anchor_idx,
        None if ig is None else ptr(ig, ctypes.c_double),
        max_iterations, convergence_threshold, epsilon,
        anchor_elo, ci_inflation,
        ptr(ratings, ctypes.c_double), ptr(uncertainties, ctypes.c_double),
        ctypes.byref(iters), ctypes.byref(delta), ctypes.byref(converged),
        ptr(gammas, ctypes.c_double),
    )
    if rc != 0:
        return None
    return (
        ratings, uncertainties, int(iters.value), float(delta.value),
        bool(converged.value), gammas,
    )
