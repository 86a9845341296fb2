"""Single-limb (uint32) staged NTT for q < 2^30 — the DQ-32 analogue.

When 4q < 2^32, coefficients and all Harvey lazy intermediates fit one
uint32 plane: half the memory traffic and ~4x fewer lane multiplies than
the 2x32-limb path (Shoup butterfly = one mulhi32 via 16-bit partials plus
two native 32-bit multiplies). Mirrors the reference's 32-bit AVX512-DQ
regime (hexl/ntt/fwd-ntt-avx512.cpp BitShift=32, best-performance bound
README.md:202-204). Same staged structure as jnp_ntt: row stages, tile
transpose, lane stages.

Lazy outputs agree with the oracle mod q within the documented ranges
(twiddles are preconditioned at bit-shift 32, so lazy intermediates differ
from the 64-bit path by multiples of q); OMF=1 outputs are bit-exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .plan import LANES, NttPlan

_MASK16 = np.uint32(0xFFFF)


def _mulhi32(a, b):
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    mid = ((a0 * b0) >> 16) + (a1 * b0 & _MASK16) + (a0 * b1 & _MASK16)
    return a1 * b1 + ((a1 * b0) >> 16) + ((a0 * b1) >> 16) + (mid >> 16)


def _shoup32(x, w, wp, q):
    """(x * w) mod q in [0, 2q); q < 2^30, any x < 2^32."""
    q_hat = _mulhi32(x, wp)
    return x * w - q_hat * q


def _fwd_bfly(xs, ys, w, wp, q, two_q):
    tx = jnp.where(xs >= two_q, xs - two_q, xs)
    t = _shoup32(ys, w, wp, q)
    return tx + t, tx + two_q - t


def _inv_bfly(xs, ys, w, wp, q, two_q):
    s = xs + ys
    tx = jnp.where(s >= two_q, s - two_q, s)
    ty = xs + two_q - ys
    return tx, _shoup32(ty, w, wp, q)


def _split2(p, axis, m, t):
    v = p.reshape(p.shape[:axis] + (m, 2 * t) + p.shape[axis + 1:])
    sl_x = [slice(None)] * v.ndim
    sl_y = [slice(None)] * v.ndim
    sl_x[axis + 1] = slice(0, t)
    sl_y[axis + 1] = slice(t, 2 * t)

    def join(nx, ny):
        out = jnp.concatenate([nx, ny], axis=axis + 1)
        return out.reshape(out.shape[:axis] + (m * 2 * t,)
                           + out.shape[axis + 2:])

    return v[tuple(sl_x)], v[tuple(sl_y)], join


def _reduce4(x, q, two_q):
    x = jnp.where(x >= two_q, x - two_q, x)
    return jnp.where(x >= q, x - q, x)


def _fwd_body(x, plan: NttPlan, fwd_a, fwd_b, omf: int):
    q = np.uint32(plan.q)
    two_q = np.uint32(2 * plan.q)
    row_axis = x.ndim - 2
    for m, t, w, wp in fwd_a:
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = _fwd_bfly(xs, ys, w[:, None, None], wp[:, None, None],
                           q, two_q)
        x = join(nx, ny)
    x = x.reshape(x.shape[:-2] + (plan.tiles, plan.lane_l, LANES)
                  ).swapaxes(-1, -2)
    c_axis = x.ndim - 2
    for m, t, w, wp in fwd_b:
        nb = LANES // (2 * t)
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = _fwd_bfly(xs, ys, w[:, :, None, :], wp[:, :, None, :],
                           q, two_q)
        x = join(nx, ny)
    x = x.swapaxes(-1, -2)
    x = x.reshape(x.shape[:-3] + (plan.rows, LANES))
    if omf == 1:
        x = _reduce4(x, q, two_q)
    return x


def _inv_body(x, plan: NttPlan, inv_b, inv_a, omf: int):
    q = np.uint32(plan.q)
    two_q = np.uint32(2 * plan.q)
    x = x.reshape(x.shape[:-2] + (plan.tiles, plan.lane_l, LANES)
                  ).swapaxes(-1, -2)
    c_axis = x.ndim - 2
    for m, t, w, wp in inv_b:
        nb = LANES // (2 * t)
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = _inv_bfly(xs, ys, w[:, :, None, :], wp[:, :, None, :],
                           q, two_q)
        x = join(nx, ny)
    x = x.swapaxes(-1, -2)
    x = x.reshape(x.shape[:-3] + (plan.rows, LANES))
    row_axis = x.ndim - 2
    for m, t, w, wp in inv_a:
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = _inv_bfly(xs, ys, w[:, None, None], wp[:, None, None],
                           q, two_q)
        x = join(nx, ny)
    # Final stage fused with N^{-1}.
    half = plan.rows // 2
    xs = x[..., :half, :]
    ys = x[..., half:, :]
    s = xs + ys
    tx = jnp.where(s >= two_q, s - two_q, s)
    ty = xs + two_q - ys
    nx = _shoup32(tx, np.uint32(plan.inv_n), np.uint32(plan.inv_n_precon32),
                  q)
    ny = _shoup32(ty, np.uint32(plan.inv_n_w),
                  np.uint32(plan.inv_n_w_precon32), q)
    x = jnp.concatenate([nx, ny], axis=row_axis)
    if omf == 1:
        x = jnp.where(x >= q, x - q, x)
    return x


# -- XLA entry points --------------------------------------------------------

def fwd_ntt32(x_lo: jnp.ndarray, plan: NttPlan, input_mod_factor: int = 1,
              output_mod_factor: int = 1) -> jnp.ndarray:
    shape = x_lo.shape
    x = x_lo.reshape(shape[:-1] + (plan.rows, LANES))
    out = _fwd_body(x, plan, plan.fwd_a32, plan.fwd_b32, output_mod_factor)
    return out.reshape(shape)


def inv_ntt32(x_lo: jnp.ndarray, plan: NttPlan, input_mod_factor: int = 1,
              output_mod_factor: int = 1) -> jnp.ndarray:
    shape = x_lo.shape
    x = x_lo.reshape(shape[:-1] + (plan.rows, LANES))
    out = _inv_body(x, plan, plan.inv_b32, plan.inv_a32, output_mod_factor)
    return out.reshape(shape)


# -- Pallas entry points ------------------------------------------------------

def _stage_planes(stages):
    planes = []
    for m, t, w, wp in stages:
        for p in (w, wp):
            planes.append(p.reshape(p.shape + (1,)) if p.ndim == 1 else p)
    return planes


def _run_pallas(x_lo, plan: NttPlan, omf: int, forward: bool):
    shape = x_lo.shape
    rows = plan.rows
    batch = 1
    for d in shape[:-1]:
        batch *= d
    x3 = x_lo.reshape(batch, rows, LANES)
    stages = (plan.fwd_a32, plan.fwd_b32) if forward else \
        (plan.inv_b32, plan.inv_a32)
    tw_planes = _stage_planes(stages[0]) + _stage_planes(stages[1])

    def kernel(*refs):
        xv = refs[0][...]
        i = 1
        s0 = []
        for m, t, w, wp in stages[0]:
            wv, wpv = refs[i][...], refs[i + 1][...]
            if w.ndim == 1:
                wv, wpv = wv[:, 0], wpv[:, 0]
            s0.append((m, t, wv, wpv))
            i += 2
        s1 = []
        for m, t, w, wp in stages[1]:
            wv, wpv = refs[i][...], refs[i + 1][...]
            if w.ndim == 1:
                wv, wpv = wv[:, 0], wpv[:, 0]
            s1.append((m, t, wv, wpv))
            i += 2
        if forward:
            out = _fwd_body(xv, plan, s0, s1, omf)
        else:
            out = _inv_body(xv, plan, s0, s1, omf)
        refs[i][...] = out

    x_spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                             memory_space=pltpu.VMEM) for p in tw_planes]
    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[x_spec] + tw_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32),
    )(x3, *tw_planes)
    return out.reshape(shape)


# Single-limb fused kernel: half the stage temporaries of the 2-limb
# kernel, so the Mosaic scoped-vmem ceiling sits one power of two higher
# (see pallas_ntt.PALLAS_MAX_N).
PALLAS32_MAX_N = 1 << 16


def fwd_ntt32_pallas(x_lo, plan, input_mod_factor=1, output_mod_factor=1):
    if plan.n > PALLAS32_MAX_N:
        return fwd_ntt32(x_lo, plan, input_mod_factor, output_mod_factor)
    return _run_pallas(x_lo, plan, output_mod_factor, True)


def inv_ntt32_pallas(x_lo, plan, input_mod_factor=1, output_mod_factor=1):
    if plan.n > PALLAS32_MAX_N:
        return inv_ntt32(x_lo, plan, input_mod_factor, output_mod_factor)
    return _run_pallas(x_lo, plan, output_mod_factor, False)
