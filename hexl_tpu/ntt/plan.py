"""NTT plan: per-(N, q) twiddle precompute and device-table layout.

The plan is the analogue of the reference's NTT engine object
(hexl/ntt/ntt-internal.cpp:24-169): it owns the bit-reversed root-of-unity
tables, their Shoup (floor(w<<64/q)) preconditioning, and — TPU-specific —
the *stage-major, layout-matched* device tables the 2D kernels consume:

  * Row stages ("phase A", stride t >= 128): data lives as (R, 128) rows,
    one twiddle per block of rows -> per-stage (m,) tables.
  * Lane stages ("phase B", stride t < 128): data is tile-transposed to
    (tiles, 128, L) so lane-dim butterflies become sublane-dim butterflies;
    twiddles become (tiles, 128/(2t), L) tables, exactly one entry per
    butterfly block (no duplication — the layout plays the role of the
    reference's duplicated W2/W4 AVX tables, ntt-internal.cpp:77-111).

All precompute is host-side NumPy, pushed to HBM once per (N, q).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Tuple

import numpy as np

from .. import nt, ref
from ..limb import U64, to_limbs

LANES = 128
MIN_2D_N = 1024  # below this the flat small-N path is used
MAX_DEGREE = 1 << 20
MAX_MODULUS = 1 << 62


def check_arguments(degree: int, modulus: int) -> None:
    """Same constraints as the reference engine (ntt-internal.cpp:171-186)."""
    if not nt.is_power_of_two(degree):
        raise ValueError(f"degree {degree} must be a power of two")
    if degree > MAX_DEGREE:
        raise ValueError(f"degree {degree} exceeds max {MAX_DEGREE}")
    if modulus > MAX_MODULUS:
        raise ValueError(f"modulus must be <= 2^62")
    if modulus % (2 * degree) != 1:
        raise ValueError("modulus must satisfy q = 1 mod 2N")
    if not nt.is_prime(modulus):
        raise ValueError("modulus must be prime")


class NttPlan:
    """Twiddle tables + derived constants for one (N, q) pair."""

    def __init__(self, degree: int, modulus: int, root: int | None = None):
        check_arguments(degree, modulus)
        self.n = degree
        self.q = modulus
        self.log_n = nt.log2_exact(degree)

        rop, irop, w = ref.root_of_unity_powers(degree, modulus, root)
        self.root = w
        self.root_inv = nt.inverse_mod(w, modulus)
        self.rop = rop                      # host numpy uint64
        self.irop = irop
        self.prop = ref.precon64(rop, modulus)
        self.pirop = ref.precon64(irop, modulus)

        # Final-inverse-stage constants (N^{-1} folded into last butterfly).
        self.inv_n = nt.inverse_mod(degree, modulus)
        self.inv_n_precon = nt.barrett_factor(self.inv_n, 64, modulus)
        self.inv_n_w = (self.inv_n * int(irop[degree - 1])) % modulus
        self.inv_n_w_precon = nt.barrett_factor(self.inv_n_w, 64, modulus)

        # Flat device tables (small-N path + generic fallbacks).
        self.rop_dev = to_limbs(rop)
        self.prop_dev = to_limbs(self.prop)
        self.irop_dev = to_limbs(irop)
        self.pirop_dev = to_limbs(self.pirop)

        # 2D-path stage tables.
        if degree >= MIN_2D_N:
            self.rows = degree // LANES
            self.lane_l = min(self.rows, LANES)
            self.tiles = self.rows // self.lane_l
            self._build_2d_tables()
        else:
            self.rows = None

    # -- 2D table construction ------------------------------------------

    def _fwd_block_w(self, m: int) -> np.ndarray:
        """Twiddles (and order) for the m-block forward stage: rop[m+b]."""
        return self.rop[m:2 * m], self.prop[m:2 * m]

    def _phase_b_table(self, table: np.ndarray, base: int, m: int,
                       t: int) -> np.ndarray:
        """Lay out table[base + block] in transposed (tiles, nb, L) order.

        Transposed coords: j = (tile*L + r)*128 + c, block = j // (2t)
        = (tile*L + r) * (128//(2t)) + c//(2t). Entry [tile, cb, r] holds
        the twiddle for butterfly block (tile*L + r)*nb + cb.
        """
        nb = LANES // (2 * t)
        tiles, L = self.tiles, self.lane_l
        tile_idx = np.arange(tiles).reshape(tiles, 1, 1)
        cb_idx = np.arange(nb).reshape(1, nb, 1)
        r_idx = np.arange(L).reshape(1, 1, L)
        block = (tile_idx * L + r_idx) * nb + cb_idx
        return table[base + block]

    def _build_2d_tables(self) -> None:
        n, q = self.n, self.q
        # Forward phase A: stages m = 1 .. (t >= 128), i.e. m <= n/256.
        self.fwd_a: List[Tuple[int, int, U64, U64]] = []
        m = 1
        while n // (2 * m) >= LANES:
            t = n // (2 * m)
            w, wp = self.rop[m:2 * m], self.prop[m:2 * m]
            self.fwd_a.append((m, t, to_limbs(w), to_limbs(wp)))
            m *= 2
        # Forward phase B: strides 64 .. 1 in the transposed layout.
        self.fwd_b: List[Tuple[int, int, U64, U64]] = []
        t = LANES // 2
        while t >= 1:
            m = n // (2 * t)
            w = self._phase_b_table(self.rop, m, m, t)
            wp = self._phase_b_table(self.prop, m, m, t)
            self.fwd_b.append((m, t, to_limbs(w), to_limbs(wp)))
            t //= 2

        # Inverse: stage-major irop is walked sequentially; strides ascend.
        self.inv_b: List[Tuple[int, int, U64, U64]] = []
        self.inv_a: List[Tuple[int, int, U64, U64]] = []
        root_index = 1
        t = 1
        while t < n // 2:
            m = n // (2 * t)
            if t < LANES:
                w = self._phase_b_table(self.irop, root_index, m, t)
                wp = self._phase_b_table(self.pirop, root_index, m, t)
                self.inv_b.append((m, t, to_limbs(w), to_limbs(wp)))
            else:
                w = self.irop[root_index:root_index + m]
                wp = self.pirop[root_index:root_index + m]
                self.inv_a.append((m, t, to_limbs(w), to_limbs(wp)))
            root_index += m
            t *= 2
        # (final t = n/2 stage is fused with inv_n; uses irop[n-1])


# ---------------------------------------------------------------------------
# Plan cache — the GetNTT analogue (ntt-cache.hpp:131-157). Python dict +
# lock instead of a readers-writer lock; plans are immutable once built.
# ---------------------------------------------------------------------------

_PLAN_CACHE: Dict[Tuple[int, int], NttPlan] = {}
_CACHE_LOCK = threading.Lock()


def get_plan(degree: int, modulus: int) -> NttPlan:
    key = (degree, modulus)
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        with _CACHE_LOCK:
            plan = _PLAN_CACHE.get(key)
            if plan is None:
                plan = NttPlan(degree, modulus)
                _PLAN_CACHE[key] = plan
    return plan


def clear_plan_cache() -> None:
    with _CACHE_LOCK:
        _PLAN_CACHE.clear()
