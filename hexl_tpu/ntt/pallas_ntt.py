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
# kernel's temporaries on the VMEM stack per traced region between ref
# stores; the writeback bodies below bound every region to one row chunk
# (phase A) or one tile (phase B), which fits both directions at N=2^16
# on v5e (a pure-functional body keeps every stage's temps live
# simultaneously and dies at 2^16; a full-width per-stage writeback body
# still peaks 0.2-1.2 MB over the 16 MB scoped limit — measured).
# Compile time for the chunked 2^16 body is steep (~8 min cold, cached
# thereafter). Larger transforms use the hierarchical two-kernel split
# (ntt/hier.py), which round-trips HBM twice (the reference handles the
# same pressure with its depth-first recursive split,
# fwd-ntt-avx512.cpp:274).
PALLAS_MAX_N_FWD = 1 << 16
PALLAS_MAX_N_INV = 1 << 16


def _butterflies(lean_ok: bool = False):
    """Pallas kernels default to the lean approximate-mulhi Shoup
    butterflies when lean_ok (every modulus < jnp_ntt.LEAN_APPROX_MAX_Q;
    values agree mod q; lazy outputs within range but not bit-equal to
    the exact form — the reference AVX512-64 semantics). Kill switch:
    HEXL_TPU_DISABLE_APPROX."""
    if config.approx_mulhi_disabled() or not lean_ok:
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
    fwd_bfly, _ = _butterflies(plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
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
    _, inv_bfly = _butterflies(plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
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


# ---------------------------------------------------------------------------
# Packed small-N bodies.
#
# At N <= 2^12 a polynomial's (rows, 128) view has rows <= 32, so the
# transposed phase-B layout (tiles, 128, lane_l=rows) leaves a minor dim
# far below the 128-lane tile — 15/16 of every vector op is padding at
# N=2^10 (and phase A's (m, t, 128) splits pad t < 8 sublanes). The packed
# bodies fold a block of kb polynomials into the MINOR axes instead:
#
#   phase A on (rows, kb*128)  — batch packed along lanes, splits on rows;
#   phase B on (128, kb*rows)  — per-poly transposes packed side by side,
#                                 twiddle tables tiled per poly (outside
#                                 the kernel, as traced operands).
#
# Same stage math, same tables, full-lane utilization. This is the
# VERDICT #2 "pack many small polynomials into one (rows, 128) tile"
# design.
# ---------------------------------------------------------------------------

def _tile_b_tables(stages, kb: int):
    """Tile phase-B twiddle tables per packed poly: (tiles, nb, L) ->
    (nb, kb*L) (tiles == 1 for every packed size). Runs OUTSIDE the
    kernel; results ride in as ordinary traced operands."""
    out = []
    for m, t, w, wp in stages:
        def rep(u):
            v = u[0]                      # (nb, L)
            nb, L = v.shape
            return jnp.broadcast_to(v[:, None, :], (nb, kb, L)).reshape(
                nb, kb * L)
        out.append((m, t, U64(rep(w.hi), rep(w.lo)),
                    U64(rep(wp.hi), rep(wp.lo))))
    return out

def _packed_stage_kernel(plan, s_stages, kb: int, omf: int, forward: bool):
    """Build a pallas kernel running the packed lane-stride phase (phase
    B) on (128, kb*rows) blocks: splits on the 128 axis with tiled
    per-poly tables.

    Only phase B is kernelized: Mosaic compiles a packed row-stride
    (phase A) body in ~6 minutes, so phase A runs as the staged XLA body
    (_xla_phase_a). The cross-layout transposes between phases also run
    in XLA (cheap at these sizes; Mosaic cannot lower a lane<->sublane
    3D permutation here).
    """
    fwd_bfly, inv_bfly = _butterflies(plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
    bfly = fwd_bfly if forward else inv_bfly
    q_i = plan.q

    def kernel(*refs):
        s, i = _load_stages(s_stages, refs, 2)
        q = const64(q_i)
        two_q = const64(2 * q_i)
        x = U64(refs[0][0], refs[1][0])   # drop the leading grid axis
        for m, t, w, wp in s:
            nb = LANES // (2 * t)
            xs, ys, join = _split2(x, 0, nb, t)
            wb = U64(w.hi[:, None, :], w.lo[:, None, :])
            wpb = U64(wp.hi[:, None, :], wp.lo[:, None, :])
            nx, ny = bfly(xs, ys, wb, wpb, q, two_q)
            x = join(nx, ny)
        if forward and omf == 1:
            x = reduce_mod_lazy64(x, q_i, 4)
        refs[i][...] = x.hi[None]
        refs[i + 1][...] = x.lo[None]

    return kernel


def _packed_call(kernel, x: U64, tw_planes, blocks: int, bshape):
    x_spec = pl.BlockSpec((1,) + bshape, lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [
        pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for p in tw_planes
    ]
    hi, lo = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[x_spec, x_spec] + tw_specs,
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct((blocks,) + bshape, jnp.uint32),
            jax.ShapeDtypeStruct((blocks,) + bshape, jnp.uint32),
        ),
    )(x.hi, x.lo, *tw_planes)
    return U64(hi, lo)


def _xla_phase_a(v: U64, plan: NttPlan, s_a, omf: int, forward: bool,
                 q, two_q) -> U64:
    """Row-stride stages on the packed (blocks, rows, kb*128) layout, as
    plain XLA ops (Mosaic takes ~6 min to compile this phase as a packed
    kernel — measured — while XLA compiles it in seconds and the extra
    HBM round trips are negligible at these sizes)."""
    fwd_bfly, inv_bfly = _butterflies(plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
    bfly = fwd_bfly if forward else inv_bfly
    for m, t, w, wp in s_a:
        xs, ys, join = _split2(v, 1, m, t // LANES)
        # Plan stage tables are 1-D (m,); broadcast to (m, 1, 1).
        wb = U64(w.hi.reshape(-1, 1, 1), w.lo.reshape(-1, 1, 1))
        wpb = U64(wp.hi.reshape(-1, 1, 1), wp.lo.reshape(-1, 1, 1))
        nx, ny = bfly(xs, ys, wb, wpb, q, two_q)
        v = join(nx, ny)
    if not forward:
        half = plan.rows // 2
        xs = U64(v.hi[:, :half], v.lo[:, :half])
        ys = U64(v.hi[:, half:], v.lo[:, half:])
        nx, ny = _final_inv_stage(xs, ys, plan, q, two_q)
        hi = jnp.concatenate([nx.hi, ny.hi], axis=1)
        lo = jnp.concatenate([nx.lo, ny.lo], axis=1)
        v = U64(hi, lo)
        if omf == 1:
            v = cond_sub64(v, q)
    return v


def _run_packed(x: U64, plan: NttPlan, omf: int, forward: bool,
                batch: int, kb: int) -> U64:
    """Packed small-N pipeline. Batch is folded into the minor axes so
    every vector op runs on full 128-lane tiles (at N=2^10 the per-poly
    layout wastes 15/16 of each lane tile — the round-1 parity gap).
    Phase B (the lane-stride stages, 7 of 10 at N=2^10) runs as one
    fused Pallas kernel; phase A and the cross transposes run in XLA."""
    rows = plan.rows
    blocks = batch // kb
    shape = x.lo.shape
    q = const64(plan.q)
    two_q = const64(2 * plan.q)

    def to_a(p):      # (batch, rows, 128) -> (blocks, rows, kb*128)
        return p.reshape(blocks, kb, rows, LANES).transpose(
            0, 2, 1, 3).reshape(blocks, rows, kb * LANES)

    def from_a(p):    # inverse of to_a
        return p.reshape(blocks, rows, kb, LANES).transpose(
            0, 2, 1, 3).reshape(shape)

    def a_to_b(p):    # (blocks, rows, kb*128) -> (blocks, 128, kb*rows)
        return p.reshape(blocks, rows, kb, LANES).transpose(
            0, 3, 2, 1).reshape(blocks, LANES, kb * rows)

    def b_to_a(p):    # inverse of a_to_b
        return p.reshape(blocks, LANES, kb, rows).transpose(
            0, 3, 2, 1).reshape(blocks, rows, kb * LANES)

    if forward:
        s_a, s_b = plan.fwd_a, _tile_b_tables(plan.fwd_b, kb)
    else:
        s_b, s_a = _tile_b_tables(plan.inv_b, kb), plan.inv_a

    pb = _stage_planes(s_b)
    kb_k = _packed_stage_kernel(plan, s_b, kb, omf, forward)

    v = U64(to_a(x.hi), to_a(x.lo))
    if forward:
        v = _xla_phase_a(v, plan, s_a, omf, True, q, two_q)
        v = U64(a_to_b(v.hi), a_to_b(v.lo))
        v = _packed_call(kb_k, v, pb, blocks, (LANES, kb * rows))
        v = U64(b_to_a(v.hi), b_to_a(v.lo))
    else:
        v = U64(a_to_b(v.hi), a_to_b(v.lo))
        v = _packed_call(kb_k, v, pb, blocks, (LANES, kb * rows))
        v = U64(b_to_a(v.hi), b_to_a(v.lo))
        v = _xla_phase_a(v, plan, s_a, omf, False, q, two_q)
    return U64(from_a(v.hi), from_a(v.lo))


def _phase_b_tilewise(plan, s1, tt, bfly, q, two_q):
    """Run the lane-stride stages tile by tile in the transposed scratch
    ((tiles, LANES, lane_l)): phase-B butterflies never cross tiles, so
    per-tile processing divides the live temporary set by plan.tiles
    (the binding constraint for the scoped-vmem ceiling at large N)."""
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


# Row-chunk size (in X-half rows) for the phase-A stages of the
# writeback bodies. Mosaic stack-allocates the temporaries of each
# traced region between ref stores; processing a stage in fixed row
# chunks (contiguous slices — a butterfly only pairs rows r and r+t/128)
# bounds every region to 2*RC rows regardless of N. (rows/2)/RC chunks
# per stage keeps the unrolled trace small.
_ROW_CHUNK = 64

# Test hook: force the writeback (ref) bodies at every size so their
# chunked stage walkers can be validated in interpret mode at small N
# (a full 2^16 interpret trace is minutes of CPU time).
_FORCE_REFS = False


def _phase_a_chunked(plan, s0, src_refs, dst_refs, bfly, q, two_q):
    """Run row-stride stages in row chunks: stage 1 streams src->dst,
    later stages update dst in place chunk by chunk (chunks are disjoint
    row sets, so per-stage in-place is safe)."""
    shi, slo = src_refs
    dhi, dlo = dst_refs
    rows = plan.rows
    for si, (m, t, w, wp) in enumerate(s0):
        tr = t // LANES
        rhi, rlo = (shi, slo) if si == 0 else (dhi, dlo)
        if tr >= _ROW_CHUNK:
            # Few wide groups: sub-chunk within each group.
            for g in range(m):
                base = g * 2 * tr
                # 0-d scalar extracts: Mosaic lowers a scalar splat, but
                # not a (1,1,1) vector broadcast into sublanes+lanes
                # (and a [slice, :, None] mixed index lowers to an
                # unsupported gather).
                wg = U64(w.hi[g, 0], w.lo[g, 0])
                wpg = U64(wp.hi[g, 0], wp.lo[g, 0])
                for j in range(0, tr, _ROW_CHUNK):
                    xsl = slice(base + j, base + j + _ROW_CHUNK)
                    ysl = slice(base + tr + j, base + tr + j + _ROW_CHUNK)
                    xs = U64(rhi[0, xsl], rlo[0, xsl])
                    ys = U64(rhi[0, ysl], rlo[0, ysl])
                    nx, ny = bfly(xs, ys, wg, wpg, q, two_q)
                    dhi[0, xsl] = nx.hi
                    dlo[0, xsl] = nx.lo
                    dhi[0, ysl] = ny.hi
                    dlo[0, ysl] = ny.lo
        else:
            # Many narrow groups: several whole groups per chunk.
            gm = max(1, _ROW_CHUNK // tr)
            gm = min(gm, m)
            for c in range(0, m, gm):
                row0 = c * 2 * tr
                row1 = (c + gm) * 2 * tr
                xv = U64(rhi[0, row0:row1], rlo[0, row0:row1])
                xs, ys, join = _split2(xv, 0, gm, tr)
                wc = U64(w.hi[c:c + gm].reshape(gm, 1, 1),
                         w.lo[c:c + gm].reshape(gm, 1, 1))
                wpc = U64(wp.hi[c:c + gm].reshape(gm, 1, 1),
                          wp.lo[c:c + gm].reshape(gm, 1, 1))
                nx, ny = bfly(xs, ys, wc, wpc, q, two_q)
                v = join(nx, ny)
                dhi[0, row0:row1] = v.hi
                dlo[0, row0:row1] = v.lo


def _fwd_ref_body(plan, s0, s1, omf, in_refs, tt, out_refs, fwd_bfly, q,
                  two_q):
    """Forward stages with per-stage writeback — bounds Mosaic's live
    temporaries (see PALLAS_MAX_N note). Works on the 2D (rows, LANES)
    view (this body only runs with one poly per grid step). The
    row-stride phase-A stages run in row chunks IN the output refs
    (first stage streams input->output); phase B runs tile-by-tile in
    the transposed scratch tt, and the final untranspose streams
    tile-by-tile straight back into the output refs (a whole-array
    untranspose holds a full extra copy live — ~0.5 MB over the limit
    at N=2^16, measured)."""
    ihi, ilo = in_refs
    thi, tlo = tt
    ohi, olo = out_refs
    if s0:
        _phase_a_chunked(plan, s0, (ihi, ilo), (ohi, olo), fwd_bfly, q,
                         two_q)
        src = U64(ohi[0], olo[0])
    else:
        src = U64(ihi[0], ilo[0])
    xt = _transpose_tiles(src, plan.tiles, plan.lane_l)
    _store(thi, tlo, xt)
    _phase_b_tilewise(plan, s1, tt, fwd_bfly, q, two_q)
    L = plan.lane_l
    for ti in range(plan.tiles):
        v = U64(thi[ti].swapaxes(-1, -2), tlo[ti].swapaxes(-1, -2))
        if omf == 1:
            v = reduce_mod_lazy64(v, plan.q, 4)
        ohi[0, ti * L:(ti + 1) * L, :] = v.hi
        olo[0, ti * L:(ti + 1) * L, :] = v.lo


def _inv_ref_body(plan, s0, s1, omf, in_refs, tt, out_refs, inv_bfly, q,
                  two_q):
    """Inverse stages with per-stage writeback (mirror of _fwd_ref_body:
    phase B' in the transposed scratch first, then phase A' working in
    the output refs, then the final stage fused with N^{-1} written
    half-by-half). The post-phase-B untranspose streams tile-by-tile
    into the output refs (a whole-array untranspose keeps a full extra
    copy live — the overage that held the inverse ceiling at 2^15)."""
    ihi, ilo = in_refs
    thi, tlo = tt
    ohi, olo = out_refs
    xt = _transpose_tiles(U64(ihi[0], ilo[0]), plan.tiles, plan.lane_l)
    _store(thi, tlo, xt)
    _phase_b_tilewise(plan, s0, tt, inv_bfly, q, two_q)
    L = plan.lane_l
    for ti in range(plan.tiles):
        ohi[0, ti * L:(ti + 1) * L, :] = thi[ti].swapaxes(-1, -2)
        olo[0, ti * L:(ti + 1) * L, :] = tlo[ti].swapaxes(-1, -2)
    if s1:
        _phase_a_chunked(plan, s1, (ohi, olo), (ohi, olo), inv_bfly, q,
                         two_q)
    # Final stage fused with N^{-1}, processed in the same row chunks
    # (pairs rows r and r+rows/2; reads materialize before writes land).
    half = plan.rows // 2
    for j in range(0, half, _ROW_CHUNK):
        c = min(_ROW_CHUNK, half - j)
        xs = U64(ohi[0, j:j + c, :], olo[0, j:j + c, :])
        ys = U64(ohi[0, half + j:half + j + c, :],
                 olo[0, half + j:half + j + c, :])
        nx, ny = _final_inv_stage(xs, ys, plan, q, two_q)
        if omf == 1:
            nx = cond_sub64(nx, q)
            ny = cond_sub64(ny, q)
        ohi[0, j:j + c, :] = nx.hi
        olo[0, j:j + c, :] = nx.lo
        ohi[0, half + j:half + j + c, :] = ny.hi
        olo[0, half + j:half + j + c, :] = ny.lo


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

    # The functional body is ~9% faster (no scratch copies) but keeps all
    # stage temporaries live; it fits the scoped-vmem limit up to 2^15.
    # Above that the chunked writeback body is the only one that compiles.
    use_refs = _FORCE_REFS or n > (1 << 15)

    # Small transforms are grid-overhead bound (N=2^10 spends ~7 us/step
    # on ~0.6 Mops of work). Pack several polynomials per grid step,
    # capped so the block's TOTAL rows stay at 64 — 128 rows OOMs the
    # Mosaic VMEM stack (measured 19.07M vs the 16M scoped limit at
    # N=2^10, kb=16). The inverse FUNCTIONAL body keeps far more live
    # (34.5M at kb=8), so batched inverse blocks run through the
    # per-stage-writeback body instead.
    # Small N: route to the packed two-kernel pipeline (full-lane tiles).
    if rows <= 32 and batch > 1:
        kb = min(batch, max(1, 128 // rows))
        while batch % kb:
            kb -= 1
        if kb > 1:
            out = _run_packed(x3, plan, omf, forward, batch, kb)
            return U64(out.hi.reshape(shape), out.lo.reshape(shape))

    kb = 1
    s_meta = stages
    tw_planes = _stage_planes(s_meta[0]) + _stage_planes(s_meta[1])

    def kernel(*refs):
        s0, i = _load_stages(s_meta[0], refs, 2)
        s1, i = _load_stages(s_meta[1], refs, i)
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
        fwd_bfly, inv_bfly = _butterflies(
            plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
        out_refs = (refs[i], refs[i + 1])
        in_refs = (refs[0], refs[1])
        tt = (refs[i + 2], refs[i + 3])
        if forward:
            _fwd_ref_body(plan, s0, s1, omf, in_refs, tt, out_refs,
                          fwd_bfly, q, two_q)
        else:
            _inv_ref_body(plan, s0, s1, omf, in_refs, tt, out_refs,
                          inv_bfly, q, two_q)

    x_spec = pl.BlockSpec((kb, rows, LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [
        pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for p in tw_planes
    ]
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(batch // kb,),
        in_specs=[x_spec, x_spec] + tw_specs,
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((batch, rows, LANES), jnp.uint32),
        ),
        # Scratch only exists for the writeback body (the transposed
        # phase-B planes; phase A works in the output refs directly — a
        # separate row-layout scratch pair is 0.5 MB the N=2^16 kernel
        # does not have). The functional body must not reserve scoped
        # vmem for nothing.
        scratch_shapes=([
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
