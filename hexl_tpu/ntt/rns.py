"""Stacked multi-modulus (RNS) NTT — one fused transform over a basis.

Production HE workloads (CKKS/BFV key-switch, RNS poly pipelines) transform
the same polynomial degree over MANY word-sized primes at once. The
reference loops single-modulus NTT calls (its engine is keyed to one q:
hexl/include/hexl/ntt/ntt.hpp:22-296, and e.g. key-switch-internal.cpp:51-90
unrolls per-modulus singles). On TPU a batch-1 transform is occupancy-bound,
so the TPU-shaped formulation is a *stacked* transform: the modulus axis is
a leading batch axis, the per-modulus twiddle tables and scalars are traced
operands with the same leading axis, and `jax.vmap` of the staged body
produces ONE fused program touching the whole (num_moduli, batch, N) block.

The stacked path always runs the 64-bit limb body (valid for every
q < 2^62); a basis mixing q < 2^30 primes still works — the single-limb
regime is a per-plan dispatch optimization that does not apply across a
heterogeneous stack.
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..limb import U64, cond_sub64_half, from_limbs, to_limbs
from . import jnp_ntt
from .plan import MIN_2D_N, get_plan


def _stack_u64(parts) -> U64:
    return U64(jnp.stack([p.hi for p in parts]),
               jnp.stack([p.lo for p in parts]))


def _scalar_vec(values) -> U64:
    a = np.array([int(v) for v in values], dtype=np.uint64)
    return to_limbs(a)


def _stack_stages(stage_lists):
    """[per-plan [(m, t, w, wp)]] -> [(m, t, stacked w, stacked wp)]."""
    out = []
    for stage in zip(*stage_lists):
        m, t = stage[0][0], stage[0][1]
        out.append((m, t, _stack_u64([s[2] for s in stage]),
                    _stack_u64([s[3] for s in stage])))
    return out


class RnsNttPlan:
    """Stacked twiddle tables for one degree over k distinct prime moduli.

    The per-(N, q) plans come from the shared plan cache; this object owns
    only the stacked device tables and scalar vectors the vmapped body
    consumes.
    """

    def __init__(self, degree: int, moduli, device=None):
        self.n = degree
        self.moduli = tuple(int(q) for q in moduli)
        if len(set(self.moduli)) != len(self.moduli):
            raise ValueError("moduli must be distinct")
        self.k = len(self.moduli)
        self.plans = [get_plan(degree, q, device) for q in self.moduli]
        self.q_vec = _scalar_vec(self.moduli)
        self.two_q_vec = _scalar_vec([2 * q for q in self.moduli])
        self.fin = (
            _scalar_vec([p.inv_n for p in self.plans]),
            _scalar_vec([p.inv_n_precon for p in self.plans]),
            _scalar_vec([p.inv_n_w for p in self.plans]),
            _scalar_vec([p.inv_n_w_precon for p in self.plans]),
        )
        if degree >= MIN_2D_N:
            p0 = self.plans[0]
            self.rows, self.tiles, self.lane_l = p0.rows, p0.tiles, p0.lane_l
            self.fwd_a = _stack_stages([p.fwd_a for p in self.plans])
            self.fwd_b = _stack_stages([p.fwd_b for p in self.plans])
            self.inv_b = _stack_stages([p.inv_b for p in self.plans])
            self.inv_a = _stack_stages([p.inv_a for p in self.plans])
        else:
            self.rows = None
            self.rop_dev = _stack_u64([p.rop_dev for p in self.plans])
            self.prop_dev = _stack_u64([p.prop_dev for p in self.plans])
            self.irop_dev = _stack_u64([p.irop_dev for p in self.plans])
            self.pirop_dev = _stack_u64([p.pirop_dev for p in self.plans])


def _skeleton(stages):
    return tuple((m, t) for m, t, _, _ in stages)


def _tables(stages):
    return [(w, wp) for _, _, w, wp in stages]


def _rebuild(skel, tabs):
    return [(m, t, w, wp) for (m, t), (w, wp) in zip(skel, tabs)]


def fwd_ntt_rns(x: U64, rplan: RnsNttPlan, input_mod_factor: int = 1,
                output_mod_factor: int = 1) -> U64:
    """Stacked forward NTT of x (k, ..., N) over rplan's k moduli.

    Row i of the output equals fwd_ntt(x[i]) under modulus moduli[i],
    bit-for-bit (same staged body, same lazy ranges).
    """
    if input_mod_factor not in (1, 2, 4):
        raise ValueError("input_mod_factor must be 1, 2 or 4")
    if output_mod_factor not in (1, 4):
        raise ValueError("output_mod_factor must be 1 or 4")
    if rplan.rows is not None:
        radix = jnp_ntt.ntt_radix_for(rplan.n)
        skel_a, skel_b = _skeleton(rplan.fwd_a), _skeleton(rplan.fwd_b)

        lean_ok, lean16_ok = jnp_ntt.scheme_gates(max(rplan.moduli), rplan.n)

        def body(xi, qi, tqi, ta, tb):
            out = jnp_ntt.fwd_body_2d(
                xi, qi, tqi, _rebuild(skel_a, ta), _rebuild(skel_b, tb),
                rplan.rows, rplan.tiles, rplan.lane_l, radix,
                lean_ok=lean_ok, lean16_ok=lean16_ok)
            if output_mod_factor == 1:
                out = cond_sub64_half(cond_sub64_half(out, tqi), qi)
            return out

        return jax.vmap(body)(x, rplan.q_vec, rplan.two_q_vec,
                              _tables(rplan.fwd_a), _tables(rplan.fwd_b))

    lean_ok_s, lean16_ok_s = jnp_ntt.scheme_gates(max(rplan.moduli), rplan.n)

    def body(xi, qi, tqi, rop, prop):
        out = jnp_ntt.fwd_body_small(
            xi, qi, tqi, rplan.n, rop, prop,
            lean_ok=lean_ok_s, lean16_ok=lean16_ok_s)
        if output_mod_factor == 1:
            out = cond_sub64_half(cond_sub64_half(out, tqi), qi)
        return out

    return jax.vmap(body)(x, rplan.q_vec, rplan.two_q_vec,
                          rplan.rop_dev, rplan.prop_dev)


def inv_ntt_rns(x: U64, rplan: RnsNttPlan, input_mod_factor: int = 1,
                output_mod_factor: int = 1) -> U64:
    """Stacked inverse NTT of x (k, ..., N) over rplan's k moduli."""
    if input_mod_factor not in (1, 2):
        raise ValueError("input_mod_factor must be 1 or 2")
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    if rplan.rows is not None:
        radix = jnp_ntt.ntt_radix_for(rplan.n)
        skel_b, skel_a = _skeleton(rplan.inv_b), _skeleton(rplan.inv_a)

        lean_ok, lean16_ok = jnp_ntt.scheme_gates(max(rplan.moduli), rplan.n)

        def body(xi, qi, tqi, tb, ta, fin):
            out = jnp_ntt.inv_body_2d(
                xi, qi, tqi, _rebuild(skel_b, tb), _rebuild(skel_a, ta),
                fin, rplan.rows, rplan.tiles, rplan.lane_l, radix,
                lean_ok=lean_ok, lean16_ok=lean16_ok)
            if output_mod_factor == 1:
                out = cond_sub64_half(out, qi)
            return out

        return jax.vmap(body)(x, rplan.q_vec, rplan.two_q_vec,
                              _tables(rplan.inv_b), _tables(rplan.inv_a),
                              rplan.fin)

    lean_ok_s, lean16_ok_s = jnp_ntt.scheme_gates(max(rplan.moduli), rplan.n)

    def body(xi, qi, tqi, irop, pirop, fin):
        out = jnp_ntt.inv_body_small(
            xi, qi, tqi, rplan.n, irop, pirop, fin,
            lean_ok=lean_ok_s, lean16_ok=lean16_ok_s)
        if output_mod_factor == 1:
            out = cond_sub64_half(out, qi)
        return out

    return jax.vmap(body)(x, rplan.q_vec, rplan.two_q_vec,
                          rplan.irop_dev, rplan.pirop_dev, rplan.fin)


# ---------------------------------------------------------------------------
# Public convenience engine mirroring the NTT class for an RNS basis.
# ---------------------------------------------------------------------------

_RNS_PLAN_CACHE: dict = {}
_RNS_LOCK = threading.Lock()


def _clear_rns_caches() -> None:
    """Flushed by plan.clear_plan_cache() so stacked plans and their
    jitted transforms die with the underlying per-(N, q) plans."""
    _RNS_PLAN_CACHE.clear()
    _jitted_rns.cache_clear()
    from .mxu_ntt import clear_mxu_cache
    clear_mxu_cache()


from .plan import register_clear_hook as _register_clear_hook  # noqa: E402

_register_clear_hook(_clear_rns_caches)


def get_rns_plan(degree: int, moduli, device=None) -> RnsNttPlan:
    key = (degree, tuple(int(q) for q in moduli),
           None if device is None else str(device))
    rp = _RNS_PLAN_CACHE.get(key)
    if rp is None:
        # Locked double-check like plan.get_plan: concurrent misses would
        # each stack full device twiddle tables (the family is documented
        # thread-safe, docs/API.md).
        with _RNS_LOCK:
            rp = _RNS_PLAN_CACHE.get(key)
            if rp is None:
                rp = RnsNttPlan(degree, key[1], device)
                _RNS_PLAN_CACHE[key] = rp
    return rp


@functools.lru_cache(maxsize=None)
def _jitted_rns(rplan: RnsNttPlan, fwd: bool, imf: int, omf: int,
                _cfg=None):
    # _cfg = config.trace_config(): the stacked bodies read the radix and
    # approx-mulhi switches at trace time, so env toggles must retrace.
    fn = fwd_ntt_rns if fwd else inv_ntt_rns
    return jax.jit(lambda x: fn(x, rplan, imf, omf))


class RnsNTT:
    """Forward/inverse negacyclic NTT over an RNS prime basis, stacked.

    rns = RnsNTT(degree, moduli)
    y = rns.forward(x)    # x: (k, ..., N); row i transformed mod moduli[i]
    x = rns.inverse(y)

    The per-row results are bit-identical to NTT(degree, moduli[i]) calls
    (tests/test_ntt.py); the stacked form exists because k batch-1 singles
    are occupancy-bound on TPU while one (k, N) fused program is not.
    """

    def __init__(self, degree: int, moduli, device=None):
        self.plan = get_rns_plan(degree, moduli, device)
        self.degree = degree
        self.moduli = self.plan.moduli

    def _dispatch(self, x, fwd: bool, imf: int, omf: int):
        host = not isinstance(x, U64)
        xl = to_limbs(np.asarray(x, dtype=np.uint64)) if host else x
        if xl.lo.ndim < 2 or xl.lo.shape[0] != len(self.moduli):
            raise ValueError(
                f"input leading axis must be the {len(self.moduli)}-prime "
                f"basis axis, got shape {xl.lo.shape}")
        from ..utils import check as _chk
        if _chk.debug_enabled():
            for i, q in enumerate(self.moduli):
                _chk.check_bounds(
                    U64(xl.hi[i], xl.lo[i]), imf * q,
                    f"{'forward' if fwd else 'inverse'} RNS NTT input "
                    f"(prime {i})")
        from .. import config as _config
        out = _jitted_rns(self.plan, fwd, imf, omf,
                          _config.trace_config())(xl)
        return from_limbs(out) if host else out

    def forward(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1):
        return self._dispatch(x, True, input_mod_factor, output_mod_factor)

    def inverse(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1):
        return self._dispatch(x, False, input_mod_factor, output_mod_factor)
