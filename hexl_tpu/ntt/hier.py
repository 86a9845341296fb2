"""Hierarchical fused NTT for degrees above the single-kernel VMEM ceiling.

The same decomposition the distributed NTT uses across chips
(hexl_tpu/parallel/dist_ntt.py, mirroring the reference's depth-first
recursive split, hexl/ntt/fwd-ntt-avx512.cpp:384-403) applied on ONE chip:

  forward:  view the (..., N) coefficients as (D, local_n) contiguous
            shards with local_n <= the fused kernel's ceiling. Stages with
            stride >= local_n pair equal local offsets across shards and
            their twiddle depends only on the shard-block index — they run
            as ONE Pallas kernel gridded over local-offset chunks ("cross"
            kernel). The remaining log2(local_n) stages are D independent
            local sub-transforms with per-shard twiddle bases — they run
            in the existing fused kernel body, gridded over (batch, D)
            with shard-indexed stage tables.
  inverse:  exact mirror: local kernel first, then the cross kernel whose
            last stage is fused with N^{-1}.

Two HBM round-trips per transform instead of log2(N) for the staged XLA
body. Tables are built once per plan via build_stage_lists with per-shard
base offsets (the DistNTT table math, verified against the oracle).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..limb import U64, cond_sub64, const64, to_limbs
from . import jnp_ntt
from .jnp_ntt import _final_inv_stage, _split2
from .plan import (LANES, NttPlan, build_cross_tables, build_stage_lists,
                   stack_stage_tables)

# Local shard size for the hierarchical split: comfortably under both
# fused-kernel ceilings (pallas_ntt.PALLAS_MAX_N_*), large enough that the
# cross kernel has few stages.
LOCAL_N = 1 << 14


class HierTables:
    """Per-plan tables for the hierarchical path (built lazily once)."""

    def __init__(self, plan: NttPlan):
        n, q = plan.n, plan.q
        d = n // LOCAL_N
        self.d = d
        self.local_n = LOCAL_N
        self.local_rows = LOCAL_N // LANES
        self.lane_l = min(self.local_rows, LANES)
        self.tiles = self.local_rows // self.lane_l

        per_dev = [
            build_stage_lists(n, plan.rop, plan.prop, plan.irop, plan.pirop,
                              self.tiles, self.lane_l,
                              base_offset=s * LOCAL_N, local_n=LOCAL_N)
            for s in range(d)
        ]
        self.fwd_a = stack_stage_tables(per_dev, 0)
        self.fwd_b = stack_stage_tables(per_dev, 1)
        self.inv_b = stack_stage_tables(per_dev, 2)
        self.inv_a = stack_stage_tables(per_dev, 3)

        # Cross-stage twiddles (replicated small tables), as in DistNTT.
        self.cross_fwd, self.cross_inv = build_cross_tables(
            n, LOCAL_N, d, plan.rop, plan.prop, plan.irop, plan.pirop)


def get_hier(plan: NttPlan) -> HierTables:
    h = getattr(plan, "_hier", None)
    if h is None:
        # get_hier is reached from inside jit traces (fwd_ntt_hier runs
        # under the caller's jit); the tables are pure host precompute and
        # are cached on the plan, so they MUST be concrete arrays — built
        # under ensure_compile_time_eval so no tracer leaks across traces.
        with jax.ensure_compile_time_eval():
            h = HierTables(plan)
        plan._hier = h
    return h


# ---------------------------------------------------------------------------
# Cross kernel: stages with stride >= LOCAL_N on the (D, local_n) view.
# Butterflies pair shards at equal local offsets -> independent per local
# offset; grid over local-offset chunks keeps the live set bounded.
# ---------------------------------------------------------------------------

def _cross_chunk(d: int, local_rows: int) -> int:
    """Local-offset rows per cross-kernel block: keep D*chunk*LANES small
    so the unrolled stage temporaries stay a few MB, but the sublane
    (second-minor) block dim must be a multiple of 8 (Mosaic tiling
    rule)."""
    return min(local_rows, max(8, 128 // d))


def _cross_call(x: U64, plan: NttPlan, h: HierTables, forward: bool,
                omf: int, bfly_pair) -> U64:
    shape = x.lo.shape
    n = plan.n
    batch = 1
    for dd in shape[:-1]:
        batch *= dd
    local_rows = h.local_rows
    x3 = U64(x.hi.reshape(batch, h.d, local_rows, LANES),
             x.lo.reshape(batch, h.d, local_rows, LANES))
    fwd_bfly, inv_bfly = bfly_pair

    chunk = _cross_chunk(h.d, local_rows)
    n_chunks = local_rows // chunk

    tw_planes = []
    cross = h.cross_fwd if forward else h.cross_inv
    for m, w, wp in cross:
        tw_planes += [w.hi.reshape(-1, 1), w.lo.reshape(-1, 1),
                      wp.hi.reshape(-1, 1), wp.lo.reshape(-1, 1)]

    def kernel(*refs):
        q = const64(plan.q)
        two_q = const64(2 * plan.q)
        xv = U64(refs[0][:, 0], refs[1][:, 0])      # (D, chunk, LANES)
        i = 2
        tws = []
        for m, _, _ in cross:
            w = U64(refs[i][...][:, 0], refs[i + 1][...][:, 0])
            wp = U64(refs[i + 2][...][:, 0], refs[i + 3][...][:, 0])
            tws.append((m, w, wp))
            i += 4
        ohi, olo = refs[i], refs[i + 1]
        def bc(v):
            # (m,) twiddle -> (m, 1, 1, 1) against (m, t', chunk, LANES).
            return U64(v.hi[:, None, None, None], v.lo[:, None, None, None])

        if forward:
            for m, w, wp in tws:
                xs, ys, join = _split2(xv, 0, m, h.d // (2 * m))
                nx, ny = fwd_bfly(xs, ys, bc(w), bc(wp), q, two_q)
                xv = join(nx, ny)
        else:
            for m, w, wp in tws:
                xs, ys, join = _split2(xv, 0, m, h.d // (2 * m))
                nx, ny = inv_bfly(xs, ys, bc(w), bc(wp), q, two_q)
                xv = join(nx, ny)
            # Global final stage fused with N^{-1} (pairs shard-halves).
            xs, ys, join = _split2(xv, 0, 1, h.d // 2)
            nx, ny = _final_inv_stage(xs, ys, plan, q, two_q)
            xv = join(nx, ny)
            if omf == 1:
                xv = cond_sub64(xv, q)
        ohi[...] = xv.hi[:, None]
        olo[...] = xv.lo[:, None]

    x_spec = pl.BlockSpec((h.d, 1, chunk, LANES),
                          lambda b, c: (0, b, c, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                             memory_space=pltpu.VMEM) for p in tw_planes]
    # Move the shard axis to the front of the blocked view so a block can
    # cover all D shards at one (batch, chunk) coordinate.
    xs4 = U64(jnp.moveaxis(x3.hi, 1, 0), jnp.moveaxis(x3.lo, 1, 0))
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(batch, n_chunks),
        in_specs=[x_spec, x_spec] + tw_specs,
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct((h.d, batch, local_rows, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((h.d, batch, local_rows, LANES),
                                 jnp.uint32),
        ),
    )(xs4.hi, xs4.lo, *tw_planes)
    out = U64(jnp.moveaxis(out_hi, 0, 1), jnp.moveaxis(out_lo, 0, 1))
    return U64(out.hi.reshape(shape), out.lo.reshape(shape))


# ---------------------------------------------------------------------------
# Local kernel: D independent sub-transforms, grid (batch, D), stage tables
# stacked on a leading shard axis and selected by the grid index map.
# ---------------------------------------------------------------------------

def _local_stage_planes(stages) -> List[jnp.ndarray]:
    planes = []
    for m, t, w, wp in stages:
        for p in (w.hi, w.lo, wp.hi, wp.lo):
            # (D, ...) -> keep leading shard axis; 2D tables get a
            # trailing singleton like the flat path.
            planes.append(p.reshape(p.shape + (1,)) if p.ndim == 2 else p)
    return planes


def _load_local_stages(stages_meta, refs, offset):
    out = []
    i = offset
    for m, t, _, _ in stages_meta:
        whi, wlo, phi, plo = (refs[i][0], refs[i + 1][0],
                              refs[i + 2][0], refs[i + 3][0])
        i += 4
        out.append((m, t, U64(whi, wlo), U64(phi, plo)))
    return out, i


def _local_call(x: U64, plan: NttPlan, h: HierTables, forward: bool,
                omf: int) -> U64:
    from . import pallas_ntt as PN

    shape = x.lo.shape
    batch = 1
    for dd in shape[:-1]:
        batch *= dd
    rows = h.local_rows
    x3 = U64(x.hi.reshape(batch * h.d, rows, LANES),
             x.lo.reshape(batch * h.d, rows, LANES))

    stages = (h.fwd_a, h.fwd_b) if forward else (h.inv_b, h.inv_a)
    tw_planes = _local_stage_planes(stages[0]) + \
        _local_stage_planes(stages[1])

    # A local-plan view with the local geometry for the shared bodies.
    class _LocalGeom:
        pass

    g = _LocalGeom()
    g.q = plan.q
    g.rows = rows
    g.tiles = h.tiles
    g.lane_l = h.lane_l

    def kernel(*refs):
        xv = U64(refs[0][...], refs[1][...])
        s0, i = _load_local_stages(stages[0], refs, 2)
        s1, i = _load_local_stages(stages[1], refs, i)
        if forward:
            out = PN._fwd_body(xv, g, s0, s1, omf)
        else:
            # Local inverse WITHOUT the global final stage (it lives in
            # the cross kernel): run phases B' then A' only.
            out = _local_inv_body(xv, g, s0, s1)
        refs[i][...] = out.hi
        refs[i + 1][...] = out.lo

    g_d = h.d
    x_spec = pl.BlockSpec((1, rows, LANES),
                          lambda b, d: (b * g_d + d, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [
        pl.BlockSpec((1,) + p.shape[1:],
                     (lambda b, d, nd=p.ndim: (d,) + (0,) * (nd - 1)),
                     memory_space=pltpu.VMEM)
        for p in tw_planes
    ]
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(batch, h.d),
        in_specs=[x_spec, x_spec] + tw_specs,
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct((batch * h.d, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((batch * h.d, rows, LANES), jnp.uint32),
        ),
    )(x3.hi, x3.lo, *tw_planes)
    return U64(out_hi.reshape(shape), out_lo.reshape(shape))


def _local_inv_body(x: U64, g, inv_b, inv_a) -> U64:
    from . import pallas_ntt as PN
    _, inv_bfly = PN._butterflies(g.q < jnp_ntt.LEAN_APPROX_MAX_Q)
    q = const64(g.q)
    two_q = const64(2 * g.q)
    x = jnp_ntt._transpose_tiles(x, g.tiles, g.lane_l)
    c_axis = x.lo.ndim - 2
    for m, t, w, wp in inv_b:
        nb = LANES // (2 * t)
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = inv_bfly(xs, ys, PN._bcast_b(w), PN._bcast_b(wp), q, two_q)
        x = join(nx, ny)
    x = jnp_ntt._untranspose_tiles(x, g.rows)
    row_axis = x.lo.ndim - 2
    for m, t, w, wp in inv_a:
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = inv_bfly(xs, ys, PN._bcast_a(w), PN._bcast_a(wp), q, two_q)
        x = join(nx, ny)
    return x


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def fwd_ntt_hier(x: U64, plan: NttPlan, input_mod_factor: int = 1,
                 output_mod_factor: int = 1) -> U64:
    """Forward NTT via the two-kernel hierarchical path (N > ceiling)."""
    from . import pallas_ntt as PN
    if plan.n <= LOCAL_N or plan.n % LOCAL_N:
        return jnp_ntt.fwd_ntt(x, plan, input_mod_factor,
                               output_mod_factor)
    h = get_hier(plan)
    bflys = PN._butterflies(plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
    x = _cross_call(x, plan, h, True, output_mod_factor, bflys)
    return _local_call(x, plan, h, True, output_mod_factor)


def inv_ntt_hier(x: U64, plan: NttPlan, input_mod_factor: int = 1,
                 output_mod_factor: int = 1) -> U64:
    """Inverse NTT via the two-kernel hierarchical path (N > ceiling)."""
    from . import pallas_ntt as PN
    if plan.n <= LOCAL_N or plan.n % LOCAL_N:
        return jnp_ntt.inv_ntt(x, plan, input_mod_factor,
                               output_mod_factor)
    h = get_hier(plan)
    bflys = PN._butterflies(plan.q < jnp_ntt.LEAN_APPROX_MAX_Q)
    x = _local_call(x, plan, h, False, output_mod_factor)
    return _cross_call(x, plan, h, False, output_mod_factor, bflys)
