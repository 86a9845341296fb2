"""Fused Pallas TPU NTT kernels.

One `pallas_call` runs the *entire* transform for a polynomial: the
(R, 128)-tiled coefficient planes and every stage twiddle table are resident
in VMEM, all log2(N) butterfly stages run back-to-back on the VPU, and the
grid pipelines polynomials of a batch through the kernel (twiddle tables use
constant index maps, so they are DMA'd once and stay in VMEM across grid
steps). This is the fusion the XLA path cannot express — the jnp NTT
round-trips HBM once per stage; this kernel reads each coefficient once and
writes it once.

The stage bodies are shared with the XLA path (hexl_tpu.ntt.jnp_ntt); only
the data residency differs. Mirrors the role of the reference's AVX-512
transform kernels (hexl/ntt/fwd-ntt-avx512.cpp, inv-ntt-avx512.cpp) with the
(8,128) vector tile replacing 8-lane zmm registers and the tile transpose
replacing the cross-lane permute loads (ntt-avx512-util.hpp).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..limb import U64, cond_sub64, const64, reduce_mod_lazy64
from . import jnp_ntt
from .jnp_ntt import (_final_inv_stage, _fwd_butterfly,
                      _fwd_butterfly_approx, _inv_butterfly,
                      _inv_butterfly_approx, _split2, _transpose_tiles,
                      _untranspose_tiles)
from .plan import LANES, NttPlan

# Largest degree the fully-fused kernel compiles for: Mosaic allocates the
# unrolled stage temporaries on the VMEM stack without reuse, so the
# working set grows with N x log N; N = 2^16 exceeds the 16 MB scoped-vmem
# limit (measured on v5e). Larger transforms use the staged XLA body,
# which round-trips HBM per stage (the reference handles the same pressure
# with its depth-first recursive split, fwd-ntt-avx512.cpp:274).
PALLAS_MAX_N = 1 << 15


def _butterflies():
    """Pallas kernels default to approximate-mulhi Shoup butterflies
    (values agree mod q; lazy outputs within range but not bit-equal to
    the exact form — the reference AVX512-64 semantics). Kill switch:
    HEXL_TPU_DISABLE_APPROX."""
    if config.approx_mulhi_disabled():
        return _fwd_butterfly, _inv_butterfly
    return _fwd_butterfly_approx, _inv_butterfly_approx


def _stage_planes(stages) -> List[jnp.ndarray]:
    """Flatten [(m, t, w:U64, wp:U64)] into a list of >=2D uint32 planes."""
    planes = []
    for m, t, w, wp in stages:
        for p in (w.hi, w.lo, wp.hi, wp.lo):
            planes.append(p.reshape(p.shape + (1,)) if p.ndim == 1 else p)
    return planes


def _load_stages(stages_meta, refs, offset):
    """Rebuild [(m, t, U64 w, U64 wp)] from kernel refs (values)."""
    out = []
    i = offset
    for m, t, _, _ in stages_meta:
        whi, wlo, phi, plo = (refs[i][...], refs[i + 1][...],
                              refs[i + 2][...], refs[i + 3][...])
        i += 4
        out.append((m, t, U64(whi, wlo), U64(phi, plo)))
    return out, i


def _bcast_a(w: U64) -> U64:
    """Phase-A twiddle (m, 1) -> (m, 1, 1)."""
    return U64(w.hi[:, :, None], w.lo[:, :, None])


def _bcast_b(w: U64) -> U64:
    """Phase-B twiddle (tiles, nb, L) -> (tiles, nb, 1, L)."""
    return U64(w.hi[:, :, None, :], w.lo[:, :, None, :])


def _fwd_body(x: U64, plan: NttPlan, fwd_a, fwd_b, omf: int) -> U64:
    fwd_bfly, _ = _butterflies()
    q = const64(plan.q)
    two_q = const64(2 * plan.q)
    row_axis = x.lo.ndim - 2
    for m, t, w, wp in fwd_a:
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = fwd_bfly(xs, ys, _bcast_a(w), _bcast_a(wp), q, two_q)
        x = join(nx, ny)
    x = _transpose_tiles(x, plan.tiles, plan.lane_l)
    c_axis = x.lo.ndim - 2
    for m, t, w, wp in fwd_b:
        nb = LANES // (2 * t)
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = fwd_bfly(xs, ys, _bcast_b(w), _bcast_b(wp), q, two_q)
        x = join(nx, ny)
    x = _untranspose_tiles(x, plan.rows)
    if omf == 1:
        x = reduce_mod_lazy64(x, plan.q, 4)
    return x


def _inv_body(x: U64, plan: NttPlan, inv_b, inv_a, omf: int) -> U64:
    _, inv_bfly = _butterflies()
    q = const64(plan.q)
    two_q = const64(2 * plan.q)
    x = _transpose_tiles(x, plan.tiles, plan.lane_l)
    c_axis = x.lo.ndim - 2
    for m, t, w, wp in inv_b:
        nb = LANES // (2 * t)
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = inv_bfly(xs, ys, _bcast_b(w), _bcast_b(wp), q, two_q)
        x = join(nx, ny)
    x = _untranspose_tiles(x, plan.rows)
    row_axis = x.lo.ndim - 2
    for m, t, w, wp in inv_a:
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = inv_bfly(xs, ys, _bcast_a(w), _bcast_a(wp), q, two_q)
        x = join(nx, ny)
    half = plan.rows // 2
    sl_x = (Ellipsis, slice(0, half), slice(None))
    sl_y = (Ellipsis, slice(half, plan.rows), slice(None))
    xs = U64(x.hi[sl_x], x.lo[sl_x])
    ys = U64(x.hi[sl_y], x.lo[sl_y])
    nx, ny = _final_inv_stage(xs, ys, plan, q, two_q)
    hi = jnp.concatenate([nx.hi, ny.hi], axis=row_axis)
    lo = jnp.concatenate([nx.lo, ny.lo], axis=row_axis)
    x = U64(hi, lo)
    if omf == 1:
        x = cond_sub64(x, q)
    return x


def _run(x: U64, plan: NttPlan, imf: int, omf: int, forward: bool) -> U64:
    shape = x.lo.shape
    n, rows = plan.n, plan.rows
    batch = 1
    for d in shape[:-1]:
        batch *= d
    x3 = U64(x.hi.reshape(batch, rows, LANES),
             x.lo.reshape(batch, rows, LANES))

    if forward:
        stages = (plan.fwd_a, plan.fwd_b)
    else:
        stages = (plan.inv_b, plan.inv_a)
    tw_planes = _stage_planes(stages[0]) + _stage_planes(stages[1])

    def kernel(*refs):
        xv = U64(refs[0][...], refs[1][...])
        s0, i = _load_stages(stages[0], refs, 2)
        s1, i = _load_stages(stages[1], refs, i)
        if forward:
            out = _fwd_body(xv, plan, s0, s1, omf)
        else:
            out = _inv_body(xv, plan, s0, s1, omf)
        refs[i][...] = out.hi
        refs[i + 1][...] = out.lo

    x_spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [
        pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for p in tw_planes
    ]
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[x_spec, x_spec] + tw_specs,
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32),
        ),
    )(x3.hi, x3.lo, *tw_planes)
    return U64(out_hi.reshape(shape), out_lo.reshape(shape))


def fwd_ntt(x: U64, plan: NttPlan, input_mod_factor: int = 1,
            output_mod_factor: int = 1) -> U64:
    """Forward NTT via the fused Pallas kernel (1024 <= N <= PALLAS_MAX_N;
    other sizes fall back to the staged XLA body)."""
    if input_mod_factor not in (1, 2, 4):
        raise ValueError("input_mod_factor must be 1, 2 or 4")
    if output_mod_factor not in (1, 4):
        raise ValueError("output_mod_factor must be 1 or 4")
    if plan.rows is None or plan.n > PALLAS_MAX_N:
        return jnp_ntt.fwd_ntt(x, plan, input_mod_factor, output_mod_factor)
    return _run(x, plan, input_mod_factor, output_mod_factor, True)


def inv_ntt(x: U64, plan: NttPlan, input_mod_factor: int = 1,
            output_mod_factor: int = 1) -> U64:
    """Inverse NTT via the fused Pallas kernel (1024 <= N <= PALLAS_MAX_N;
    other sizes fall back to the staged XLA body)."""
    if input_mod_factor not in (1, 2):
        raise ValueError("input_mod_factor must be 1 or 2")
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    if plan.rows is None or plan.n > PALLAS_MAX_N:
        return jnp_ntt.inv_ntt(x, plan, input_mod_factor, output_mod_factor)
    return _run(x, plan, input_mod_factor, output_mod_factor, False)
