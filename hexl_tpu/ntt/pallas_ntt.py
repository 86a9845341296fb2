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

from typing import List

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

# Largest degree the fully-fused kernel compiles for. Mosaic allocates a
# kernel's temporaries on the VMEM stack per live range; the kernel below
# bounds the live set to ONE stage's temporaries by writing each stage's
# result back to a VMEM scratch buffer (a pure-functional body keeps every
# stage's temps live simultaneously and already dies at N = 2^16). With
# the writeback structure the per-stage live set itself exceeds the 16 MB
# scoped-vmem limit beyond these bounds (measured on v5e; the inverse
# kernel's row-stage loop is ~1.2x fatter than the forward's, so its
# ceiling sits one notch lower). Larger transforms use the staged XLA
# body, which round-trips HBM per stage (the reference handles the same
# pressure with its depth-first recursive split, fwd-ntt-avx512.cpp:274).
PALLAS_MAX_N_FWD = 1 << 16
PALLAS_MAX_N_INV = 1 << 15


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


def _store(hi_ref, lo_ref, v: U64) -> None:
    hi_ref[...] = v.hi
    lo_ref[...] = v.lo


def _phase_b_tilewise(plan, s1, tt, bfly, q, two_q):
    """Run the lane-stride stages tile by tile in the transposed scratch:
    phase-B butterflies never cross tiles, so per-tile processing divides
    the live temporary set by plan.tiles (the binding constraint for the
    scoped-vmem ceiling at large N)."""
    thi, tlo = tt
    for ti in range(plan.tiles):
        xv = U64(thi[ti], tlo[ti])          # (LANES, lane_l)
        for m, t, w, wp in s1:
            nb = LANES // (2 * t)
            xs, ys, join = _split2(xv, 0, nb, t)
            wt = U64(w.hi[ti][:, None, :], w.lo[ti][:, None, :])
            wpt = U64(wp.hi[ti][:, None, :], wp.lo[ti][:, None, :])
            nx, ny = bfly(xs, ys, wt, wpt, q, two_q)
            xv = join(nx, ny)
        thi[ti] = xv.hi
        tlo[ti] = xv.lo


def _fwd_ref_body(plan, s0, s1, omf, rr, tt, fwd_bfly, q, two_q):
    """Forward stages with per-stage writeback to scratch refs rr/tt
    ((rows,LANES) and transposed (tiles,LANES,L)) — bounds Mosaic's live
    temporaries to one stage (see PALLAS_MAX_N note)."""
    rhi, rlo = rr
    thi, tlo = tt
    for m, t, w, wp in s0:
        xv = U64(rhi[...], rlo[...])
        xs, ys, join = _split2(xv, 0, m, t // LANES)
        nx, ny = fwd_bfly(xs, ys, _bcast_a(w), _bcast_a(wp), q, two_q)
        _store(rhi, rlo, join(nx, ny))
    xt = _transpose_tiles(U64(rhi[...], rlo[...]), plan.tiles, plan.lane_l)
    _store(thi, tlo, xt)
    _phase_b_tilewise(plan, s1, tt, fwd_bfly, q, two_q)
    out = _untranspose_tiles(U64(thi[...], tlo[...]), plan.rows)
    if omf == 1:
        out = reduce_mod_lazy64(out, plan.q, 4)
    return out


def _inv_ref_body(plan, s0, s1, omf, rr, tt, inv_bfly, q, two_q):
    """Inverse stages with per-stage writeback (mirror of _fwd_ref_body:
    phase B' in the transposed scratch first, then phase A', then the
    final stage fused with N^{-1})."""
    rhi, rlo = rr
    thi, tlo = tt
    xt = _transpose_tiles(U64(rhi[...], rlo[...]), plan.tiles, plan.lane_l)
    _store(thi, tlo, xt)
    _phase_b_tilewise(plan, s0, tt, inv_bfly, q, two_q)
    _store(rhi, rlo, _untranspose_tiles(U64(thi[...], tlo[...]), plan.rows))
    for m, t, w, wp in s1:
        xv = U64(rhi[...], rlo[...])
        xs, ys, join = _split2(xv, 0, m, t // LANES)
        nx, ny = inv_bfly(xs, ys, _bcast_a(w), _bcast_a(wp), q, two_q)
        _store(rhi, rlo, join(nx, ny))
    # Final stage fused with N^{-1}, written back half-by-half to keep
    # the live set small (the concatenating form pushes N=2^16 over the
    # scoped-vmem limit).
    half = plan.rows // 2
    xs = U64(rhi[:half, :], rlo[:half, :])
    ys = U64(rhi[half:, :], rlo[half:, :])
    nx, ny = _final_inv_stage(xs, ys, plan, q, two_q)
    if omf == 1:
        nx = cond_sub64(nx, q)
    rhi[:half, :] = nx.hi
    rlo[:half, :] = nx.lo
    if omf == 1:
        ny = cond_sub64(ny, q)
    rhi[half:, :] = ny.hi
    rlo[half:, :] = ny.lo
    return U64(rhi[...], rlo[...])


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

    # The functional body is ~9% faster (no scratch copies) but keeps all
    # stage temporaries live; it fits the scoped-vmem limit up to 2^15.
    # Above that the writeback body is the only one that compiles. (With
    # the current gates only the forward reaches use_refs — the inverse
    # routes to the hierarchical path above 2^15 — but the inverse
    # writeback body is kept so the INV ceiling can be raised
    # independently.)
    use_refs = n > (1 << 15)

    def kernel(*refs):
        s0, i = _load_stages(stages[0], refs, 2)
        s1, i = _load_stages(stages[1], refs, i)
        if not use_refs:
            xv = U64(refs[0][...], refs[1][...])
            if forward:
                out = _fwd_body(xv, plan, s0, s1, omf)
            else:
                out = _inv_body(xv, plan, s0, s1, omf)
            refs[i][...] = out.hi
            refs[i + 1][...] = out.lo
            return
        q = const64(plan.q)
        two_q = const64(2 * plan.q)
        fwd_bfly, inv_bfly = _butterflies()
        ohi, olo = refs[i], refs[i + 1]
        rr = (refs[i + 2], refs[i + 3])
        tt = (refs[i + 4], refs[i + 5])
        rr[0][...] = refs[0][0]
        rr[1][...] = refs[1][0]
        if forward:
            out = _fwd_ref_body(plan, s0, s1, omf, rr, tt, fwd_bfly, q,
                                two_q)
        else:
            out = _inv_ref_body(plan, s0, s1, omf, rr, tt, inv_bfly, q,
                                two_q)
        ohi[...] = out.hi[None]
        olo[...] = out.lo[None]

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
        # Scratch only exists for the writeback body; the functional body
        # must not reserve ~16N bytes of the scoped-vmem budget for nothing.
        scratch_shapes=([
            pltpu.VMEM((rows, LANES), jnp.uint32),
            pltpu.VMEM((rows, LANES), jnp.uint32),
            pltpu.VMEM((plan.tiles, LANES, plan.lane_l), jnp.uint32),
            pltpu.VMEM((plan.tiles, LANES, plan.lane_l), jnp.uint32),
        ] if use_refs else []),
    )(x3.hi, x3.lo, *tw_planes)
    return U64(out_hi.reshape(shape), out_lo.reshape(shape))


def fwd_ntt(x: U64, plan: NttPlan, input_mod_factor: int = 1,
            output_mod_factor: int = 1) -> U64:
    """Forward NTT via the fused Pallas kernel (1024 <= N <= PALLAS_MAX_N_FWD;
    other sizes fall back to the staged XLA body)."""
    if input_mod_factor not in (1, 2, 4):
        raise ValueError("input_mod_factor must be 1, 2 or 4")
    if output_mod_factor not in (1, 4):
        raise ValueError("output_mod_factor must be 1 or 4")
    if plan.rows is None:
        return jnp_ntt.fwd_ntt(x, plan, input_mod_factor, output_mod_factor)
    if plan.n > PALLAS_MAX_N_FWD:
        from . import hier
        return hier.fwd_ntt_hier(x, plan, input_mod_factor,
                                 output_mod_factor)
    return _run(x, plan, input_mod_factor, output_mod_factor, True)


def inv_ntt(x: U64, plan: NttPlan, input_mod_factor: int = 1,
            output_mod_factor: int = 1) -> U64:
    """Inverse NTT via the fused Pallas kernel (1024 <= N <= PALLAS_MAX_N_INV;
    other sizes fall back to the staged XLA body)."""
    if input_mod_factor not in (1, 2):
        raise ValueError("input_mod_factor must be 1 or 2")
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    if plan.rows is None:
        return jnp_ntt.inv_ntt(x, plan, input_mod_factor, output_mod_factor)
    if plan.n > PALLAS_MAX_N_INV:
        from . import hier
        return hier.inv_ntt_hier(x, plan, input_mod_factor,
                                 output_mod_factor)
    return _run(x, plan, input_mod_factor, output_mod_factor, False)
