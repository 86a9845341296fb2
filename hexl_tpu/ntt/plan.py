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


def phase_b_table(table: np.ndarray, base: int, t: int, tiles: int,
                  lane_l: int) -> np.ndarray:
    """Lay out table[base + block] in transposed (tiles, nb, L) order.

    Transposed coords: j = (tile*L + r)*128 + c, block = j // (2t)
    = (tile*L + r) * (128//(2t)) + c//(2t). Entry [tile, cb, r] holds the
    twiddle for butterfly block (tile*L + r)*nb + cb. Used by both the
    single-chip plan and the per-shard tables of the distributed NTT.
    """
    nb = LANES // (2 * t)
    tile_idx = np.arange(tiles).reshape(tiles, 1, 1)
    cb_idx = np.arange(nb).reshape(1, nb, 1)
    r_idx = np.arange(lane_l).reshape(1, 1, lane_l)
    block = (tile_idx * lane_l + r_idx) * nb + cb_idx
    return table[base + block]


def build_stage_lists(n: int, rop: np.ndarray, prop: np.ndarray,
                      irop: np.ndarray, pirop: np.ndarray,
                      tiles: int, lane_l: int, base_offset: int = 0,
                      local_n: int | None = None, pack=None):
    """Build (fwd_a, fwd_b, inv_b, inv_a) stage-table lists for a length-
    `local_n` staged transform whose block twiddles start at `base_offset`
    within each stage's global table segment.

    For the single-chip plan local_n == n and base_offset == 0. For the
    distributed NTT, device d passes local_n = n // D and base_offset =
    d * local_n // (2t) per stage (handled here via the closure over t).
    Returns lists of (m_local, t, U64 w, U64 wp).
    """
    if local_n is None:
        local_n = n
    if pack is None:
        pack = to_limbs
    fwd_a, fwd_b, inv_b, inv_a = [], [], [], []
    # Forward: strides descend local_n/2 .. 1; global stage has m_g = n/(2t)
    # blocks starting at table index m_g; this shard covers blocks
    # [base_offset//(2t) ... ) of them.
    t = local_n // 2
    while t >= 1:
        m_g = n // (2 * t)
        m_local = local_n // (2 * t)
        base = m_g + base_offset // (2 * t)
        if t >= LANES:
            w, wp = rop[base:base + m_local], prop[base:base + m_local]
            fwd_a.append((m_local, t, pack(w), pack(wp)))
        else:
            w = phase_b_table(rop, base, t, tiles, lane_l)
            wp = phase_b_table(prop, base, t, tiles, lane_l)
            fwd_b.append((m_local, t, pack(w), pack(wp)))
        t //= 2
    # Inverse: stage-major irop walked by ascending stride; global root
    # index for the stage at stride t is 1 + sum_{s<t} n/(2s) = n/(2t)·...
    # computed incrementally.
    root_index = 1
    t = 1
    while t < local_n:  # includes the final local stage only if local_n < n
        m_g = n // (2 * t)
        m_local = local_n // (2 * t)
        if t == n // 2:
            break  # global final stage is fused with N^{-1}
        base = root_index + base_offset // (2 * t)
        if t < LANES:
            w = phase_b_table(irop, base, t, tiles, lane_l)
            wp = phase_b_table(pirop, base, t, tiles, lane_l)
            inv_b.append((m_local, t, pack(w), pack(wp)))
        else:
            w = irop[base:base + m_local]
            wp = pirop[base:base + m_local]
            inv_a.append((m_local, t, pack(w), pack(wp)))
        root_index += m_g
        t *= 2
    return fwd_a, fwd_b, inv_b, inv_a


class NttPlan:
    """Twiddle tables + derived constants for one (N, q) pair.

    `device` optionally pins every device-side table to a specific
    jax.Device or Sharding — the analogue of the reference's allocator
    injection (NTT::AllocatorAdapter, hexl/include/hexl/ntt/ntt.hpp:25-84),
    where callers controlled where the engine's tables live.
    """

    def __init__(self, degree: int, modulus: int, root: int | None = None,
                 device=None):
        check_arguments(degree, modulus)
        self.n = degree
        self.q = modulus
        self.log_n = nt.log2_exact(degree)

        from .. import native
        if root is None:
            root = nt.minimal_primitive_root(2 * degree, modulus)
        elif not nt.is_primitive_root(root, 2 * degree, modulus):
            raise ValueError(
                f"{root} is not a primitive {2 * degree}-th root of unity "
                f"mod {modulus}")
        tables = native.root_tables(degree, modulus, root)
        if tables is not None:
            rop, irop, prop, pirop = tables
        else:
            rop, irop, _ = ref.root_of_unity_powers(degree, modulus, root)
            prop = ref.precon64(rop, modulus)
            pirop = ref.precon64(irop, modulus)
        self.root = root
        self.root_inv = nt.inverse_mod(root, modulus)
        self.rop = rop                      # host numpy uint64
        self.irop = irop
        self.prop = prop
        self.pirop = pirop

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
        if device is not None:
            self._place_tables(device)

    def _place_tables(self, device) -> None:
        """device_put every device-side table onto `device`."""
        import jax

        def put(v):
            return jax.device_put(v, device)

        def put_u64(u: U64) -> U64:
            return U64(put(u.hi), put(u.lo))

        self.rop_dev = put_u64(self.rop_dev)
        self.prop_dev = put_u64(self.prop_dev)
        self.irop_dev = put_u64(self.irop_dev)
        self.pirop_dev = put_u64(self.pirop_dev)
        for name in ("fwd_a", "fwd_b", "inv_b", "inv_a"):
            stages = getattr(self, name, None)
            if stages is not None:
                setattr(self, name,
                        [(m, t, put_u64(w), put_u64(wp))
                         for m, t, w, wp in stages])
        for name in ("fwd_a32", "fwd_b32", "inv_b32", "inv_a32"):
            stages = getattr(self, name, None)
            if stages is not None:
                setattr(self, name,
                        [(m, t, put(w), put(wp))
                         for m, t, w, wp in stages])

    # -- 2D table construction ------------------------------------------

    def _build_2d_tables(self) -> None:
        self.fwd_a, self.fwd_b, self.inv_b, self.inv_a = build_stage_lists(
            self.n, self.rop, self.prop, self.irop, self.pirop,
            self.tiles, self.lane_l)
        # Single-limb fast path for q < 2^30 (the reference's AVX512-DQ
        # 32-bit regime, README.md:202-204): all values < 4q < 2^32 fit one
        # uint32 plane; twiddles preconditioned at bit-shift 32.
        self.bit_shift = 32 if self.q < (1 << 30) else 64
        if self.bit_shift == 32:
            import jax.numpy as jnp
            q = self.q

            def precon32(tab):
                return np.array([(int(v) << 32) // q for v in tab],
                                dtype=np.uint64)

            def pack32(a):
                return jnp.asarray(a.astype(np.uint32))

            (self.fwd_a32, self.fwd_b32, self.inv_b32,
             self.inv_a32) = build_stage_lists(
                self.n, self.rop, precon32(self.rop), self.irop,
                precon32(self.irop), self.tiles, self.lane_l, pack=pack32)
            self.inv_n_precon32 = (self.inv_n << 32) // q
            self.inv_n_w_precon32 = (self.inv_n_w << 32) // q


# ---------------------------------------------------------------------------
# Plan cache — the GetNTT analogue (ntt-cache.hpp:131-157). Python dict +
# lock instead of a readers-writer lock; plans are immutable once built.
# ---------------------------------------------------------------------------

_PLAN_CACHE: Dict[Tuple[int, int], NttPlan] = {}
_CACHE_LOCK = threading.Lock()

# Callbacks run by clear_plan_cache() so derived caches (e.g. the jitted
# transform caches in ntt/__init__.py, which hold strong references to
# plan objects) are flushed together with the plans themselves.
_CLEAR_HOOKS: List = []


def register_clear_hook(fn) -> None:
    _CLEAR_HOOKS.append(fn)


def get_plan(degree: int, modulus: int, device=None) -> NttPlan:
    key = (degree, modulus, None if device is None else str(device))
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        with _CACHE_LOCK:
            plan = _PLAN_CACHE.get(key)
            if plan is None:
                # Plans are cached across jit traces, so their device
                # tables must be concrete even if a caller builds one
                # inside a traced function (tracer-leak hardening).
                import jax
                with jax.ensure_compile_time_eval():
                    plan = NttPlan(degree, modulus, device=device)
                _PLAN_CACHE[key] = plan
    return plan


def clear_plan_cache() -> None:
    with _CACHE_LOCK:
        _PLAN_CACHE.clear()
    for fn in _CLEAR_HOOKS:
        fn()


# ---------------------------------------------------------------------------
# On-disk plan serialization — the checkpoint/resume analogue (SURVEY.md §5:
# the reference's only persistent state is the memoized NTT cache; here the
# host twiddle tables can be saved and restored so cold starts skip the
# O(N log q) root/precondition computation).
# ---------------------------------------------------------------------------

def save_plan_cache(path: str) -> int:
    """Serialize every cached plan's host tables to `path` (.npz).

    Returns the number of (N, q) pairs saved. Device-pinned plan variants
    share the default plan's host tables, so each (N, q) is saved once and
    device placement is NOT persisted — a restored plan lives wherever the
    next dispatch puts it.
    """
    import numpy as _np
    with _CACHE_LOCK:
        items = list(_PLAN_CACHE.items())
    arrays = {}
    seen = set()
    for cache_key, plan in items:
        n, q = cache_key[0], cache_key[1]
        if (n, q) in seen:
            continue  # device-pinned duplicate of the same host tables
        seen.add((n, q))
        key = f"{n}_{q}"
        arrays[f"rop_{key}"] = plan.rop
        arrays[f"irop_{key}"] = plan.irop
        arrays[f"prop_{key}"] = plan.prop
        arrays[f"pirop_{key}"] = plan.pirop
        arrays[f"root_{key}"] = _np.uint64(plan.root)
    _np.savez_compressed(path, **arrays)
    return len(seen)


def load_plan_cache(path: str) -> int:
    """Restore plans saved by save_plan_cache; returns the number loaded.

    Loaded tables are verified against check_arguments-level invariants
    (sizes and the root) but trusted otherwise — treat the file like any
    other precomputed key material.
    """
    import numpy as _np
    data = _np.load(path)
    keys = set()
    for name in data.files:
        if name.startswith("rop_"):
            n_s, q_s = name[len("rop_"):].split("_")
            keys.add((int(n_s), int(q_s)))
    count = 0
    for n, q in sorted(keys):
        key = f"{n}_{q}"
        rop = data[f"rop_{key}"]
        irop = data[f"irop_{key}"]
        prop = data[f"prop_{key}"]
        pirop = data[f"pirop_{key}"]
        root = int(data[f"root_{key}"])
        if rop.shape != (n,) or irop.shape != (n,):
            raise ValueError(f"corrupt plan tables for (N={n}, q={q})")
        # Rebuild the plan from the stored tables without recomputing them.
        plan = _plan_from_tables(n, q, root, rop, irop, prop, pirop)
        with _CACHE_LOCK:
            _PLAN_CACHE[(n, q, None)] = plan
        count += 1
    return count


def _plan_from_tables(n, q, root, rop, irop, prop, pirop) -> NttPlan:
    plan = NttPlan.__new__(NttPlan)
    check_arguments(n, q)
    if not nt.is_primitive_root(root, 2 * n, q):
        raise ValueError(
            f"stored root {root} is not a primitive {2 * n}-th root of "
            f"unity mod {q}")
    # Spot-check table consistency: rop[i] must be root^{bitrev(i)} mod q
    # and prop its 64-bit Barrett precondition (corrupt/tampered files
    # would otherwise silently produce wrong transforms on restore).
    for i in (1, n // 2, n - 1):
        expect = nt.pow_mod(root, nt.reverse_bits(i, nt.log2_exact(n)), q)
        if int(rop[i]) != expect:
            raise ValueError(f"corrupt rop table for (N={n}, q={q})")
        if int(prop[i]) != (expect << 64) // q:
            raise ValueError(f"corrupt prop table for (N={n}, q={q})")
        # irop is stage-major reordered; validate that each entry is a
        # power of root^{-1} with a matching Shoup precondition.
        iv = int(irop[i])
        if iv >= q or int(pirop[i]) != (iv << 64) // q:
            raise ValueError(f"corrupt irop table for (N={n}, q={q})")
    # The stage-major inverse table ends with root^{-N/2} (feeds inv_n_w).
    if int(irop[n - 1]) != nt.pow_mod(nt.inverse_mod(root, q), n // 2, q):
        raise ValueError(f"corrupt irop table for (N={n}, q={q})")
    plan.n = n
    plan.q = q
    plan.log_n = nt.log2_exact(n)
    plan.root = root
    plan.root_inv = nt.inverse_mod(root, q)
    plan.rop, plan.irop, plan.prop, plan.pirop = rop, irop, prop, pirop
    plan.inv_n = nt.inverse_mod(n, q)
    plan.inv_n_precon = nt.barrett_factor(plan.inv_n, 64, q)
    plan.inv_n_w = (plan.inv_n * int(irop[n - 1])) % q
    plan.inv_n_w_precon = nt.barrett_factor(plan.inv_n_w, 64, q)
    plan.rop_dev = to_limbs(rop)
    plan.prop_dev = to_limbs(prop)
    plan.irop_dev = to_limbs(irop)
    plan.pirop_dev = to_limbs(pirop)
    if n >= MIN_2D_N:
        plan.rows = n // LANES
        plan.lane_l = min(plan.rows, LANES)
        plan.tiles = plan.rows // plan.lane_l
        plan._build_2d_tables()
    else:
        plan.rows = None
    return plan


def stack_stage_tables(per_shard, idx):
    """Stack one stage-list kind from per-shard build_stage_lists outputs
    onto a leading shard axis (shared by the distributed NTT's per-device
    tables and the hierarchical path's per-shard tables)."""
    import jax.numpy as jnp
    out = []
    for s in range(len(per_shard[0][idx])):
        m, t = per_shard[0][idx][s][0], per_shard[0][idx][s][1]
        w = U64(jnp.stack([ps[idx][s][2].hi for ps in per_shard]),
                jnp.stack([ps[idx][s][2].lo for ps in per_shard]))
        wp = U64(jnp.stack([ps[idx][s][3].hi for ps in per_shard]),
                 jnp.stack([ps[idx][s][3].lo for ps in per_shard]))
        out.append((m, t, w, wp))
    return out


def build_cross_tables(n: int, local_n: int, d: int, rop, prop, irop,
                       pirop):
    """Twiddles for the stages whose stride >= local_n ("cross" stages in
    both the distributed and the on-chip hierarchical decompositions).

    Forward: stages m = 1..d/2 read rop[m:2m] (block index = shard-block).
    Inverse: strides local_n..n/4 walk the stage-major irop after all
    local stages; the final n/2-stride stage is fused with N^{-1} by the
    caller. Returns (cross_fwd, cross_inv) as [(m, U64 w, U64 wp)].
    """
    cross_fwd = []
    m = 1
    while m <= d // 2:
        cross_fwd.append((m, to_limbs(rop[m:2 * m]),
                          to_limbs(prop[m:2 * m])))
        m *= 2
    root_index = 1
    t = 1
    while t < local_n:
        root_index += n // (2 * t)
        t *= 2
    cross_inv = []
    while t < n // 2:
        m = n // (2 * t)
        cross_inv.append((m, to_limbs(irop[root_index:root_index + m]),
                          to_limbs(pirop[root_index:root_index + m])))
        root_index += m
        t *= 2
    return cross_fwd, cross_inv
