"""Public element-wise API with per-call kernel-path dispatch.

Mirrors the reference dispatcher structure (hexl/eltwise/eltwise-*.cpp):
each public op checks the active backend / kill-switch and forwards to the
Pallas TPU kernel or the portable jnp path. All static parameters (modulus,
mod factors, cmp, bound, diff) are baked into a cached jitted callable.

Inputs may be `limb.U64` pytrees (device-resident, preferred) or host
numpy/array-like uint64 — the latter are converted at the boundary and the
result is returned as numpy uint64.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np

from .. import config
from ..limb import U64, coerce_limbs, from_limbs, to_limbs
from ..utils import check as _chk
from ..utils.logging import vlog
from . import jnp_kernels as K
from . import jnp_kernels32 as K32
from . import pallas_kernels as P

# Single-limb regime bound — the reference's DQ-32 best-performance bound
# (README.md:202-204): ops whose values stay below 2^32 run on one uint32
# plane (~4x fewer lane ops). Chosen per (op, q, imf) inside _jitted.
_SMALL_Q = 1 << 30


def _run(body, ins):
    # Measured on v5e: XLA's own fusion beats the generic Pallas runner
    # for standalone element-wise ops (e.g. mult_mod 1.17 vs 1.60 us/call
    # at (1024, 8192) — the runner's flatten/pad adds copies), so the
    # portable body is the default everywhere. HEXL_TPU_FORCE_PALLAS_ELTWISE
    # opts into the runner (useful for pipelines that chain many eltwise
    # ops in one VMEM residency).
    if (config.use_pallas() and config.force_pallas_eltwise()
            and all(u.lo.ndim > 0 for u in ins)):
        # Scalar (rank-0) operands can't ride the tiled runner (its
        # flatten/pad would zero-extend them); those ops use the XLA body.
        return P.run_eltwise(body, ins)
    return body(*ins)


def _jitted(op: str, *static):
    """Build + jit the op with its static parameters baked in. The jit
    cache is additionally keyed on config.trace_config(): the bodies read
    the approx-mulhi/runner switches at trace time, so an env toggle
    mid-process must retrace rather than reuse the first trace."""
    return _jitted_impl(config.trace_config(), op, *static)


@functools.lru_cache(maxsize=None)
def _jitted_impl(_cfg, op: str, *static):
    if op == "add_mod_vv":
        (q,) = static
        kk = K32.add_mod32 if q < _SMALL_Q else K.add_mod
        body = lambda a, b: kk(a, b, q)
        return jax.jit(lambda a, b: _run(body, (a, b)))
    if op == "add_mod_vs":
        # Scalar passed as a traced operand: one compile per (op, q), not
        # per scalar value (unbounded-cache / recompile hazard otherwise).
        (q,) = static
        kk = K32.add_mod32 if q < _SMALL_Q else K.add_mod
        body = lambda a, s: kk(a, s, q)
        return jax.jit(lambda a, s: _run(body, (a, s)))
    if op == "sub_mod_vv":
        (q,) = static
        kk = K32.sub_mod32 if q < _SMALL_Q else K.sub_mod
        body = lambda a, b: kk(a, b, q)
        return jax.jit(lambda a, b: _run(body, (a, b)))
    if op == "sub_mod_vs":
        (q,) = static
        kk = K32.sub_mod32 if q < _SMALL_Q else K.sub_mod
        body = lambda a, s: kk(a, s, q)
        return jax.jit(lambda a, s: _run(body, (a, s)))
    if op == "mult_mod":
        q, imf = static
        if q < _SMALL_Q and imf * q < (1 << 32):
            body = lambda a, b: K32.mult_mod32(a, b, q, imf)
        else:
            body = lambda a, b: K.mult_mod(a, b, q, imf)
        return jax.jit(lambda a, b: _run(body, (a, b)))
    if op == "fma_mod":
        # The scalar and its Shoup precondition are traced operands
        # (reduced/preconditioned host-side in eltwise_fma_mod; the
        # precondition's bit shift matches the selected regime).
        q, imf, has_arg3 = static
        small = q < _SMALL_Q and imf * q < (1 << 32)
        kk = K32.fma_mod32_preconned if small else K.fma_mod_preconned
        if has_arg3:
            body = lambda a, w, wp, c: kk(a, w, wp, c, q, imf)
            return jax.jit(lambda a, w, wp, c: _run(body, (a, w, wp, c)))
        body = lambda a, w, wp: kk(a, w, wp, None, q, imf)
        return jax.jit(lambda a, w, wp: _run(body, (a, w, wp)))
    if op == "reduce_mod":
        q, imf, omf = static
        if q < _SMALL_Q and imf in (2, 4):
            body = lambda a: K32.reduce_mod32(a, q, imf, omf)
        else:
            body = lambda a: K.reduce_mod(a, q, imf, omf)
        return jax.jit(lambda a: _run(body, (a,)))
    if op == "cmp_add":
        (cmp,) = static
        body = lambda a, bound, diff: K.cmp_add(a, cmp, bound, diff)
        return jax.jit(lambda a, bound, diff: _run(body, (a, bound, diff)))
    if op == "cmp_sub_mod":
        q, cmp = static
        body = lambda a, bound, diff: K.cmp_sub_mod(a, q, cmp, bound, diff)
        return jax.jit(lambda a, bound, diff: _run(body, (a, bound, diff)))
    if op == "mont_form_in":
        (q,) = static
        body = lambda a: K.montgomery_form_in(a, q)
        return jax.jit(lambda a: _run(body, (a,)))
    if op == "mont_form_out":
        (q,) = static
        body = lambda a: K.montgomery_form_out(a, q)
        return jax.jit(lambda a: _run(body, (a,)))
    if op == "mont_mult_reduce":
        (q,) = static
        body = lambda a, b: K.montgomery_mult_reduce(a, b, q)
        return jax.jit(lambda a, b: _run(body, (a, b)))
    raise ValueError(f"unknown op {op}")


def _scalar64(v) -> U64:
    """Host scalar -> U64 of () uint32 arrays (a traced operand)."""
    return to_limbs(np.uint64(int(v)))


_coerce = coerce_limbs


def _result(out: U64, was_host: bool):
    return from_limbs(out) if was_host else out


def eltwise_add_mod(a, b, modulus: int):
    """result[i] = (a[i] + b[i]) mod q; b may be a scalar. Inputs < q."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1, "modulus must be > 1")
        _chk.check_bounds(a, modulus, "eltwise_add_mod operand1")
        if not (np.isscalar(b) or isinstance(b, int)):
            _chk.check_bounds(b, modulus, "eltwise_add_mod operand2")
    vlog(3, "eltwise_add_mod q=%d", modulus)
    a_l, host = _coerce(a)
    if np.isscalar(b) or isinstance(b, int):
        s_l = _scalar64(b)
        return _result(_jitted("add_mod_vs", modulus)(a_l, s_l), host)
    b_l, _ = _coerce(b)
    return _result(_jitted("add_mod_vv", modulus)(a_l, b_l), host)


def eltwise_sub_mod(a, b, modulus: int):
    """result[i] = (a[i] - b[i]) mod q; b may be a scalar. Inputs < q."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1, "modulus must be > 1")
        _chk.check(modulus < (1 << 63), "modulus must be < 2^63")
        _chk.check_bounds(a, modulus, "eltwise_sub_mod operand1")
        if np.isscalar(b) or isinstance(b, int):
            _chk.check(int(b) < modulus,
                       "eltwise_sub_mod operand2 must be < modulus")
        else:
            _chk.check_bounds(b, modulus, "eltwise_sub_mod operand2")
    vlog(3, "eltwise_sub_mod q=%d", modulus)
    a_l, host = _coerce(a)
    if np.isscalar(b) or isinstance(b, int):
        s_l = _scalar64(b)
        return _result(_jitted("sub_mod_vs", modulus)(a_l, s_l), host)
    b_l, _ = _coerce(b)
    return _result(_jitted("sub_mod_vv", modulus)(a_l, b_l), host)


def eltwise_mult_mod(a, b, modulus: int, input_mod_factor: int = 1):
    """result[i] = (a[i] * b[i]) mod q; inputs < IMF*q, IMF in {1,2,4}."""
    if _chk.debug_enabled():
        _chk.check(input_mod_factor in (1, 2, 4),
                   "input_mod_factor must be 1, 2 or 4")
        _chk.check(input_mod_factor * modulus < (1 << 63),
                   "input_mod_factor * modulus must be < 2^63")
        _chk.check_bounds(a, input_mod_factor * modulus,
                          "eltwise_mult_mod operand1")
        _chk.check_bounds(b, input_mod_factor * modulus,
                          "eltwise_mult_mod operand2")
    vlog(3, "eltwise_mult_mod q=%d imf=%d", modulus, input_mod_factor)
    a_l, host = _coerce(a)
    b_l, _ = _coerce(b)
    return _result(
        _jitted("mult_mod", modulus, input_mod_factor)(a_l, b_l), host)


def eltwise_fma_mod(arg1, arg2: int, arg3, modulus: int,
                    input_mod_factor: int = 1):
    """result[i] = (arg1[i] * arg2 + arg3[i]) mod q; arg3 may be None."""
    from .. import nt as _nt
    if _chk.debug_enabled():
        _chk.check(modulus > 1, "modulus must be > 1")
        _chk.check(modulus < (1 << 61), "modulus must be < 2^61")
        _chk.check(input_mod_factor in (1, 2, 4, 8),
                   "input_mod_factor must be 1, 2, 4 or 8")
        _chk.check(int(arg2) < input_mod_factor * modulus,
                   "arg2 exceeds input_mod_factor * modulus")
        _chk.check_bounds(arg1, input_mod_factor * modulus,
                          "eltwise_fma_mod arg1")
        if arg3 is not None:
            _chk.check_bounds(arg3, input_mod_factor * modulus,
                              "eltwise_fma_mod arg3")
    vlog(3, "eltwise_fma_mod q=%d imf=%d", modulus, input_mod_factor)
    a_l, host = _coerce(arg1)
    a2 = _nt.reduce_mod(int(arg2), modulus, input_mod_factor)
    small = (modulus < _SMALL_Q
             and input_mod_factor * modulus < (1 << 32))
    shift = 32 if small else 64
    w = _scalar64(a2)
    wp = _scalar64(_nt.barrett_factor(a2, shift, modulus))
    if arg3 is None:
        fn = _jitted("fma_mod", modulus, input_mod_factor, False)
        return _result(fn(a_l, w, wp), host)
    c_l, _ = _coerce(arg3)
    fn = _jitted("fma_mod", modulus, input_mod_factor, True)
    return _result(fn(a_l, w, wp, c_l), host)


def eltwise_reduce_mod(a, modulus: int, input_mod_factor: int,
                       output_mod_factor: int):
    """Range change: IMF in {2, 4, modulus} -> OMF in {1, 2}."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1, "modulus must be > 1")
        _chk.check(input_mod_factor == modulus
                   or input_mod_factor in (2, 4),
                   "input_mod_factor must be modulus, 2 or 4")
        _chk.check(output_mod_factor in (1, 2),
                   "output_mod_factor must be 1 or 2")
        _chk.check(input_mod_factor != output_mod_factor,
                   "input_mod_factor must differ from output_mod_factor")
        if input_mod_factor != modulus:
            _chk.check_bounds(a, input_mod_factor * modulus,
                              "eltwise_reduce_mod operand")
    vlog(3, "eltwise_reduce_mod q=%d imf=%d omf=%d", modulus,
         input_mod_factor, output_mod_factor)
    a_l, host = _coerce(a)
    fn = _jitted("reduce_mod", modulus, input_mod_factor, output_mod_factor)
    return _result(fn(a_l), host)


def eltwise_cmp_add(a, cmp: str, bound: int, diff: int):
    """result[i] = cmp(a[i], bound) ? a[i] + diff : a[i]."""
    if _chk.debug_enabled():
        _chk.check(int(diff) != 0, "diff must be != 0")
    vlog(3, "eltwise_cmp_add cmp=%s", cmp)
    a_l, host = _coerce(a)
    return _result(
        _jitted("cmp_add", cmp)(a_l, _scalar64(bound), _scalar64(diff)),
        host)


def eltwise_cmp_sub_mod(a, modulus: int, cmp: str, bound: int, diff: int):
    """result[i] = cmp(a[i], bound) ? (a[i] - diff) mod q : a[i] mod q."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1, "modulus must be > 1")
        _chk.check(int(diff) != 0, "diff must be != 0")
    vlog(3, "eltwise_cmp_sub_mod q=%d cmp=%s", modulus, cmp)
    a_l, host = _coerce(a)
    return _result(
        _jitted("cmp_sub_mod", modulus, cmp)(a_l, _scalar64(bound),
                                             _scalar64(diff)), host)


def eltwise_montgomery_form_in(a, modulus: int):
    """a * 2^64 mod q."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1 and modulus % 2 == 1,
                   "modulus must be odd and > 1")
        _chk.check_bounds(a, modulus, "montgomery_form_in operand")
    a_l, host = _coerce(a)
    return _result(_jitted("mont_form_in", modulus)(a_l), host)


def eltwise_montgomery_form_out(a, modulus: int):
    """a * 2^-64 mod q."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1 and modulus % 2 == 1,
                   "modulus must be odd and > 1")
        _chk.check_bounds(a, modulus, "montgomery_form_out operand")
    a_l, host = _coerce(a)
    return _result(_jitted("mont_form_out", modulus)(a_l), host)


def eltwise_montgomery_mult_reduce(a, b, modulus: int):
    """REDC(a*b) = a*b*2^-64 mod q for a, b in [0, q)."""
    if _chk.debug_enabled():
        _chk.check(modulus > 1 and modulus % 2 == 1,
                   "modulus must be odd and > 1")
        _chk.check_bounds(a, modulus, "montgomery_mult_reduce operand1")
        _chk.check_bounds(b, modulus, "montgomery_mult_reduce operand2")
    a_l, host = _coerce(a)
    b_l, _ = _coerce(b)
    return _result(_jitted("mont_mult_reduce", modulus)(a_l, b_l), host)


# Flushed with the plan cache (same contract as ntt/__init__; the eltwise
# graphs hold no plans, but a full clear should leave no stale traces).
from ..ntt.plan import register_clear_hook as _register_clear_hook  # noqa: E402

_register_clear_hook(_jitted_impl.cache_clear)
