"""Fused polynomial pipelines — the framework's flagship composite ops.

poly_mult_mod: negacyclic polynomial product c = a*b mod (X^N+1, q) as ONE
fused kernel per batch element: both forward NTTs, the pointwise Barrett
multiply, and the inverse NTT run back-to-back in VMEM (the XLA path runs
the same chain in one jit). This is the pipeline the reference composes
from separate kernel calls (fwd NTT -> EltwiseMultMod -> inv NTT); fusing
removes four HBM round-trips of intermediates and all intermediate
dispatches.

rns_poly_mult_mod: the same pipeline over an RNS basis — the 2k forward and
k inverse transforms run as two stacked multi-modulus calls (ntt/rns.py)
inside one jit; only the pointwise multiply loops per prime (trace-time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config
from .eltwise import jnp_kernels as K
from .limb import U64, coerce_limbs, from_limbs, to_limbs
from .ntt import get_plan, jnp_ntt
from .ntt.pallas_ntt import (_butterflies, _fwd_body, _inv_body,
                             _load_stages, _stage_planes)
from .ntt.plan import LANES


def _poly_mult_pallas(a: U64, b: U64, plan) -> U64:
    """One fused kernel: fwd(a), fwd(b), mult-mod, inv — all in VMEM."""
    shape = a.lo.shape
    rows = plan.rows
    batch = 1
    for d in shape[:-1]:
        batch *= d
    a3 = U64(a.hi.reshape(batch, rows, LANES),
             a.lo.reshape(batch, rows, LANES))
    b3 = U64(b.hi.reshape(batch, rows, LANES),
             b.lo.reshape(batch, rows, LANES))

    stage_groups = (plan.fwd_a, plan.fwd_b, plan.inv_b, plan.inv_a)
    tw_planes = []
    for g in stage_groups:
        tw_planes += _stage_planes(g)

    def kernel(*refs):
        av = U64(refs[0][...], refs[1][...])
        bv = U64(refs[2][...], refs[3][...])
        i = 4
        loaded = []
        for g in stage_groups:
            s, i = _load_stages(g, refs, i)
            loaded.append(s)
        fwd_a, fwd_b, inv_b, inv_a = loaded
        fa = _fwd_body(av, plan, fwd_a, fwd_b, 4)     # lazy [0,4q)
        fb = _fwd_body(bv, plan, fwd_a, fwd_b, 4)
        prod = K.mult_mod(fa, fb, plan.q, 4)          # [0, q)
        out = _inv_body(prod, plan, inv_b, inv_a, 1)
        refs[i][...] = out.hi
        refs[i + 1][...] = out.lo

    x_spec = pl.BlockSpec((1, rows, LANES), lambda bb: (bb, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                             memory_space=pltpu.VMEM) for p in tw_planes]
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[x_spec] * 4 + tw_specs,
        out_specs=(x_spec, x_spec),
        out_shape=(jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32)),
    )(a3.hi, a3.lo, b3.hi, b3.lo, *tw_planes)
    return U64(out_hi.reshape(shape), out_lo.reshape(shape))


def _poly_mult_staged(a: U64, b: U64, plan) -> U64:
    """Pallas per-transform (not fully fused): for N above the fused
    kernel's VMEM ceiling."""
    from .ntt import pallas_ntt
    fa = pallas_ntt.fwd_ntt(a, plan, 1, 4)
    fb = pallas_ntt.fwd_ntt(b, plan, 1, 4)
    prod = K.mult_mod(fa, fb, plan.q, 4)
    return pallas_ntt.inv_ntt(prod, plan, 1, 1)


def _poly_mult_xla(a: U64, b: U64, plan) -> U64:
    fa = jnp_ntt.fwd_ntt(a, plan, 1, 4)
    fb = jnp_ntt.fwd_ntt(b, plan, 1, 4)
    prod = K.mult_mod(fa, fb, plan.q, 4)
    return jnp_ntt.inv_ntt(prod, plan, 1, 1)


@functools.lru_cache(maxsize=None)
def _jitted_poly_mult(n: int, q: int, use_pallas: bool, _cfg=None):
    # _cfg = config.trace_config(): the bodies read the radix/approx
    # switches at trace time, so env toggles must retrace.
    plan = get_plan(n, q)
    # The fused triple-transform kernel holds ~3 transforms of unrolled
    # temporaries; it hits Mosaic's scoped-vmem ceiling one notch below
    # the single-transform kernel (pallas_ntt.PALLAS_MAX_N).
    if use_pallas and plan.rows is not None and n <= (1 << 14):
        return jax.jit(lambda a, b: _poly_mult_pallas(a, b, plan))
    if use_pallas and plan.rows is not None:
        from .ntt import pallas_ntt
        return jax.jit(lambda a, b: _poly_mult_staged(a, b, plan))
    return jax.jit(lambda a, b: _poly_mult_xla(a, b, plan))


def poly_mult_mod(a, b, degree: int, modulus: int):
    """c = a * b over Z_q[X]/(X^N + 1); inputs (..., N) in [0, q).

    Operands may mix host numpy and device U64 forms; the result is numpy
    iff any input came from the host.
    """
    a_l, a_host = coerce_limbs(a)
    b_l, b_host = coerce_limbs(b)
    fn = _jitted_poly_mult(degree, modulus, config.use_pallas(),
                           config.trace_config())
    out = fn(a_l, b_l)
    return from_limbs(out) if (a_host or b_host) else out


@functools.lru_cache(maxsize=None)
def _jitted_rns_poly_mult(n: int, moduli: tuple, _cfg=None):
    """Stacked RNS pipeline: the 2k forward + k inverse transforms run as
    two stacked multi-modulus calls (ntt/rns.py); only the pointwise
    Barrett multiply stays a per-modulus trace-time loop (its quotient
    shift is modulus-bit-length dependent, so it cannot vmap across a
    heterogeneous basis — it is one fused eltwise region per prime)."""
    from .ntt.rns import fwd_ntt_rns, get_rns_plan, inv_ntt_rns
    rplan = get_rns_plan(n, moduli)

    def fn(a: U64, b: U64) -> U64:
        fa = fwd_ntt_rns(a, rplan, 1, 4)
        fb = fwd_ntt_rns(b, rplan, 1, 4)
        prods = [K.mult_mod(U64(fa.hi[i], fa.lo[i]),
                            U64(fb.hi[i], fb.lo[i]), q, 4)
                 for i, q in enumerate(moduli)]
        stacked = U64(jnp.stack([p.hi for p in prods]),
                      jnp.stack([p.lo for p in prods]))
        return inv_ntt_rns(stacked, rplan, 1, 1)

    return jax.jit(fn)


def rns_poly_mult_mod(a, b, degree: int, moduli):
    """Per-prime negacyclic products: a, b shaped (num_primes, ..., N) with
    residues along the leading axis; returns the same shape."""
    moduli = [int(q) for q in moduli]
    a_l, a_host = coerce_limbs(a)
    b_l, b_host = coerce_limbs(b)
    host = a_host or b_host
    if (len(set(moduli)) == len(moduli) and len(moduli) > 1
            and not config.use_pallas()):
        out = _jitted_rns_poly_mult(degree, tuple(moduli),
                                    config.trace_config())(a_l, b_l)
        return from_limbs(out) if host else out
    outs = []
    for i, q in enumerate(moduli):
        outs.append(poly_mult_mod(U64(a_l.hi[i], a_l.lo[i]),
                                  U64(b_l.hi[i], b_l.lo[i]), degree, q))
    if host:
        return np.stack([from_limbs(o) for o in outs])
    return U64(jnp.stack([o.hi for o in outs]),
               jnp.stack([o.lo for o in outs]))


from .ntt.plan import register_clear_hook as _register_clear_hook  # noqa: E402

_register_clear_hook(_jitted_poly_mult.cache_clear)
_register_clear_hook(_jitted_rns_poly_mult.cache_clear)
