"""Coefficient-sharded NTT over a jax.sharding.Mesh — the scale-out path.

The reference library's only scaling device is a cache-blocking recursive
split of the transform (hexl/ntt/fwd-ntt-avx512.cpp:384-403, noted in
SURVEY.md §5); across chips the same decomposition becomes:

  forward:  all_to_all "transpose"  ->  log2(D) cross-device butterfly
            stages, now fully local on the regrouped axis  ->  all_to_all
            back  ->  independent local sub-transform per shard (strides
            t < N/D), using per-shard twiddle-table slices.
  inverse:  the exact mirror, with the final N^{-1}-fused stage inside the
            cross phase.

The coefficient axis is sharded over the `coeff` mesh axis; leading batch
dims (e.g. a batch of polynomials under one modulus) shard over `batch`.
Exactly two all-to-alls of N/D coefficients per transform ride the ICI;
everything else is local VPU work, so scaling efficiency is bounded by
(butterfly work) / (butterfly work + 2 transposes), which is >90% for
N >= 2^14 on an 8-chip ring.

Per-shard twiddle tables are built host-side with the same machinery as the
single-chip plan (hexl_tpu.ntt.plan.build_stage_lists with per-device base
offsets) and passed into shard_map pre-sharded, so no twiddle traffic moves
at transform time.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .. import config
from .. import nt
from ..limb import (U64, add64, coerce_limbs, cond_sub64, const64,
                    reduce_mod_lazy64, sub64, to_limbs, from_limbs)
from ..ntt import jnp_ntt
from ..ntt.jnp_ntt import _fwd_butterfly, _inv_butterfly, _shoup, _split2
from ..ntt.plan import (LANES, build_cross_tables, build_stage_lists,
                        get_plan, stack_stage_tables)


def make_mesh(n_coeff: int, n_batch: int = 1,
              devices=None) -> Mesh:
    """A (batch, coeff) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_coeff * n_batch]).reshape(
        n_batch, n_coeff)
    return Mesh(devices, ("batch", "coeff"))


class DistNTT:
    """NTT with the coefficient axis sharded over `mesh`'s 'coeff' axis."""

    def __init__(self, degree: int, modulus: int, mesh: Mesh,
                 overlap_slices: Optional[int] = None):
        """overlap_slices: split each cross-phase exchange into this many
        independent slice collectives so XLA's async-collective scheduler
        can overlap butterflies of slice s with the all-to-all of slice
        s+1 (compute/communication overlap, SNIPPETS.md §1 pattern at the
        collective level). None reads HEXL_TPU_DIST_OVERLAP; <=1 keeps the
        single blocking exchange."""
        from .. import config as _config
        self.mesh = mesh
        self.n = degree
        self.q = modulus
        self.d = mesh.shape["coeff"]
        if overlap_slices is None:
            overlap_slices = _config.dist_overlap_slices()
        self.overlap_slices = max(1, int(overlap_slices))
        if degree % (self.d * self.d) != 0:
            raise ValueError("degree must be divisible by D^2")
        self.local_n = degree // self.d
        if self.local_n < 2 * LANES:
            raise ValueError("local shard too small; reduce coeff axis")
        self.plan = get_plan(degree, modulus)

        local_rows = self.local_n // LANES
        lane_l = min(local_rows, LANES)
        tiles = local_rows // lane_l
        self.local_rows, self.lane_l, self.tiles = local_rows, lane_l, tiles

        p = self.plan
        # Per-device local stage tables (leading device axis, sharded).
        per_dev = [
            build_stage_lists(degree, p.rop, p.prop, p.irop, p.pirop,
                              tiles, lane_l, base_offset=d * self.local_n,
                              local_n=self.local_n)
            for d in range(self.d)
        ]
        self.fwd_a = stack_stage_tables(per_dev, 0)
        self.fwd_b = stack_stage_tables(per_dev, 1)
        self.inv_b = stack_stage_tables(per_dev, 2)
        self.inv_a = stack_stage_tables(per_dev, 3)

        # Cross-phase twiddles (replicated small tables; same math as the
        # on-chip hierarchical path).
        self.cross_fwd, self.cross_inv = build_cross_tables(
            degree, self.local_n, self.d, p.rop, p.prop, p.irop, p.pirop)

        self._fwd_cache = {}
        self._inv_cache = {}

    # -- shard_map bodies -------------------------------------------------

    def _slice_count(self, lc: int) -> int:
        """Slices for the overlapped cross phase: must divide lc and keep
        slices lane-aligned when possible."""
        s = self.overlap_slices
        while s > 1 and lc % s != 0:
            s -= 1
        return max(1, s)

    def _sliced_cross(self, x: U64, lc: int, stage_fn) -> U64:
        """Run `stage_fn` ((..., d, lc_s) -> same) over `overlap_slices`
        independent slices of the chunk axis, each with its own pair of
        all-to-alls. Slices have no data dependencies, so XLA's
        latency-hiding scheduler overlaps slice s's butterflies with
        slice s+1's exchange."""
        axis = x.lo.ndim - 1  # chunk-offset axis (length lc)
        s = self._slice_count(lc)
        step = lc // s
        outs = []
        for i in range(s):
            sl = [slice(None)] * x.lo.ndim
            sl[axis] = slice(i * step, (i + 1) * step)
            piece = U64(x.hi[tuple(sl)], x.lo[tuple(sl)])
            a2a_axis = piece.lo.ndim - 2
            piece = U64(
                jax.lax.all_to_all(piece.hi, "coeff", a2a_axis, a2a_axis,
                                   tiled=False),
                jax.lax.all_to_all(piece.lo, "coeff", a2a_axis, a2a_axis,
                                   tiled=False))
            piece = stage_fn(piece)
            piece = U64(
                jax.lax.all_to_all(piece.hi, "coeff", a2a_axis, a2a_axis,
                                   tiled=False),
                jax.lax.all_to_all(piece.lo, "coeff", a2a_axis, a2a_axis,
                                   tiled=False))
            outs.append(piece)
        if s == 1:
            return outs[0]
        return U64(jnp.concatenate([p.hi for p in outs], axis=axis),
                   jnp.concatenate([p.lo for p in outs], axis=axis))

    def _cross_fwd_body(self, x: U64, q: U64, two_q: U64) -> U64:
        """Device-axis butterflies on the (D, local_n/D) regrouped block."""
        d = self.d
        if d == 1:
            return x  # no cross stages on a single-shard coeff axis
        # x local shape (..., local_n); regroup to (D, local_n/D) chunks and
        # transpose so the device axis is resident.
        lc = self.local_n // d
        shape = x.lo.shape
        x = U64(x.hi.reshape(shape[:-1] + (d, lc)),
                x.lo.reshape(shape[:-1] + (d, lc)))

        def stages(piece: U64) -> U64:
            # Axis -2 is the global device axis (length D), axis -1 this
            # shard's slice of local offsets. Cross stages run on axis -2.
            axis = piece.lo.ndim - 2
            for m, w, wp in self.cross_fwd:
                xs, ys, join = _split2(piece, axis, m, d // (2 * m))
                wb = U64(w.hi[:, None, None], w.lo[:, None, None])
                wpb = U64(wp.hi[:, None, None], wp.lo[:, None, None])
                nx, ny = _fwd_butterfly(xs, ys, wb, wpb, q, two_q)
                piece = join(nx, ny)
            return piece

        x = self._sliced_cross(x, lc, stages)
        return U64(x.hi.reshape(shape), x.lo.reshape(shape))

    def _cross_inv_body(self, x: U64, q: U64, two_q: U64) -> U64:
        d = self.d
        p = self.plan
        if d == 1:
            # Single-shard coeff axis: only the final fused stage remains,
            # pairing halves of the local vector.
            xs, ys, join = _split2(x, x.lo.ndim - 1, 1, self.n // 2)
            tx = cond_sub64(add64(xs, ys), two_q)
            ty = sub64(add64(xs, two_q), ys)
            nx = _shoup(tx, const64(p.inv_n), const64(p.inv_n_precon), q)
            ny = _shoup(ty, const64(p.inv_n_w), const64(p.inv_n_w_precon),
                        q)
            return join(nx, ny)
        lc = self.local_n // d
        shape = x.lo.shape
        x = U64(x.hi.reshape(shape[:-1] + (d, lc)),
                x.lo.reshape(shape[:-1] + (d, lc)))

        def stages(piece: U64) -> U64:
            axis = piece.lo.ndim - 2
            for m, w, wp in self.cross_inv:
                xs, ys, join = _split2(piece, axis, m, d // (2 * m))
                wb = U64(w.hi[:, None, None], w.lo[:, None, None])
                wpb = U64(wp.hi[:, None, None], wp.lo[:, None, None])
                nx, ny = _inv_butterfly(xs, ys, wb, wpb, q, two_q)
                piece = join(nx, ny)
            # Final stage fused with N^{-1}: pairs device-halves (m = 1).
            xs, ys, join = _split2(piece, axis, 1, d // 2)
            tx = cond_sub64(add64(xs, ys), two_q)
            ty = sub64(add64(xs, two_q), ys)
            pp = self.plan
            nx = _shoup(tx, const64(pp.inv_n), const64(pp.inv_n_precon), q)
            ny = _shoup(ty, const64(pp.inv_n_w),
                        const64(pp.inv_n_w_precon), q)
            return join(nx, ny)

        x = self._sliced_cross(x, lc, stages)
        return U64(x.hi.reshape(shape), x.lo.reshape(shape))

    # -- fused Pallas local transforms (TPU path) ---------------------------
    #
    # Inside shard_map each device runs an independent local sub-transform;
    # on TPU it goes through the same fused kernel body as the single-chip
    # engine, with this shard's stage tables passed as (traced) kernel
    # operands instead of host constants. CPU meshes (tests, dryrun) use
    # the jnp bodies below. Gated by backend + the fused-kernel geometry
    # constraints (local_rows >= 8 sublanes, local_n <= VMEM ceiling).

    @property
    def _pallas_local_ok(self) -> bool:
        from .. import config
        return (config.use_pallas() and self.local_rows >= 8
                and self.local_n <= (1 << 15))

    def _pallas_local(self, x: U64, s0, s1, forward: bool,
                      omf: int) -> U64:
        import types

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..ntt import hier as H
        from ..ntt import pallas_ntt as PN

        shape = x.lo.shape
        rows = self.local_rows
        batch = 1
        for d in shape[:-1]:
            batch *= d
        x3 = U64(x.hi.reshape(batch, rows, LANES),
                 x.lo.reshape(batch, rows, LANES))

        geom = types.SimpleNamespace(q=self.q, rows=rows,
                                     tiles=self.tiles, lane_l=self.lane_l)
        metas = []
        tw_planes = []
        for m, t, w, wp in list(s0) + list(s1):
            metas.append((m, t))
            for p in (w.hi, w.lo, wp.hi, wp.lo):
                tw_planes.append(p.reshape(p.shape + (1,))
                                 if p.ndim == 1 else p)
        n0 = len(s0)

        def kernel(*refs):
            xv = U64(refs[0][...], refs[1][...])
            loaded = []
            i = 2
            for m, t in metas:
                loaded.append((m, t,
                               U64(refs[i][...], refs[i + 1][...]),
                               U64(refs[i + 2][...], refs[i + 3][...])))
                i += 4
            if forward:
                out = PN._fwd_body(xv, geom, loaded[:n0], loaded[n0:], omf)
            else:
                # Local inverse WITHOUT the global final stage (it runs in
                # the cross phase) — the hier local body.
                out = H._local_inv_body(xv, geom, loaded[:n0], loaded[n0:])
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

    def _local_fwd_body(self, x: U64, stages_a, stages_b, omf: int,
                        q: U64, two_q: U64) -> U64:
        """Local sub-transform (strides local_n/2 .. 1) on this shard."""
        if self._pallas_local_ok:
            return self._pallas_local(x, stages_a, stages_b, True, omf)
        shape = x.lo.shape
        rows = self.local_rows
        x = U64(x.hi.reshape(shape[:-1] + (rows, LANES)),
                x.lo.reshape(shape[:-1] + (rows, LANES)))
        row_axis = x.lo.ndim - 2
        for m, t, w, wp in stages_a:
            xs, ys, join = _split2(x, row_axis, m, t // LANES)
            wb = U64(w.hi[:, None, None], w.lo[:, None, None])
            wpb = U64(wp.hi[:, None, None], wp.lo[:, None, None])
            nx, ny = _fwd_butterfly(xs, ys, wb, wpb, q, two_q)
            x = join(nx, ny)
        x = jnp_ntt._transpose_tiles(x, self.tiles, self.lane_l)
        c_axis = x.lo.ndim - 2
        for m, t, w, wp in stages_b:
            nb = LANES // (2 * t)
            xs, ys, join = _split2(x, c_axis, nb, t)
            wb = U64(w.hi[:, :, None, :], w.lo[:, :, None, :])
            wpb = U64(wp.hi[:, :, None, :], wp.lo[:, :, None, :])
            nx, ny = _fwd_butterfly(xs, ys, wb, wpb, q, two_q)
            x = join(nx, ny)
        x = jnp_ntt._untranspose_tiles(x, rows)
        x = U64(x.hi.reshape(shape), x.lo.reshape(shape))
        if omf == 1:
            x = reduce_mod_lazy64(x, self.q, 4)
        return x

    def _local_inv_body(self, x: U64, stages_b, stages_a,
                        q: U64, two_q: U64) -> U64:
        if self._pallas_local_ok:
            return self._pallas_local(x, stages_b, stages_a, False, 2)
        shape = x.lo.shape
        rows = self.local_rows
        x = U64(x.hi.reshape(shape[:-1] + (rows, LANES)),
                x.lo.reshape(shape[:-1] + (rows, LANES)))
        x = jnp_ntt._transpose_tiles(x, self.tiles, self.lane_l)
        c_axis = x.lo.ndim - 2
        for m, t, w, wp in stages_b:
            nb = LANES // (2 * t)
            xs, ys, join = _split2(x, c_axis, nb, t)
            wb = U64(w.hi[:, :, None, :], w.lo[:, :, None, :])
            wpb = U64(wp.hi[:, :, None, :], wp.lo[:, :, None, :])
            nx, ny = _inv_butterfly(xs, ys, wb, wpb, q, two_q)
            x = join(nx, ny)
        x = jnp_ntt._untranspose_tiles(x, rows)
        row_axis = x.lo.ndim - 2
        for m, t, w, wp in stages_a:
            xs, ys, join = _split2(x, row_axis, m, t // LANES)
            wb = U64(w.hi[:, None, None], w.lo[:, None, None])
            wpb = U64(wp.hi[:, None, None], wp.lo[:, None, None])
            nx, ny = _inv_butterfly(xs, ys, wb, wpb, q, two_q)
            x = join(nx, ny)
        return U64(x.hi.reshape(shape), x.lo.reshape(shape))

    # -- public API --------------------------------------------------------

    @staticmethod
    def _x_spec(ndim: int, batch_shard: bool = True) -> P:
        """Coefficients shard over 'coeff'; the leading dim (if any) over
        'batch' when batch_shard (it must then divide the batch axis);
        middle dims replicated. batch_shard=False replicates every
        leading dim — the composite pipelines (dist_key_switch) use it
        for modulus-count axes that need not divide the mesh."""
        if ndim == 1 or not batch_shard:
            return P(*([None] * (ndim - 1)), "coeff")
        return P("batch", *([None] * (ndim - 2)), "coeff")

    def _build_fwd(self, imf: int, omf: int, ndim: int,
                   batch_shard: bool = True):
        mesh = self.mesh
        x_spec = self._x_spec(ndim, batch_shard)

        def body(x_hi, x_lo, *tables):
            x = U64(x_hi, x_lo)
            q = const64(self.q)
            two_q = const64(2 * self.q)
            na = len(self.fwd_a)
            sa = [(self.fwd_a[i][0], self.fwd_a[i][1],
                   U64(tables[4 * i][0], tables[4 * i + 1][0]),
                   U64(tables[4 * i + 2][0], tables[4 * i + 3][0]))
                  for i in range(na)]
            off = 4 * na
            sb = [(self.fwd_b[i][0], self.fwd_b[i][1],
                   U64(tables[off + 4 * i][0], tables[off + 4 * i + 1][0]),
                   U64(tables[off + 4 * i + 2][0],
                       tables[off + 4 * i + 3][0]))
                  for i in range(len(self.fwd_b))]
            x = self._cross_fwd_body(x, q, two_q)
            x = self._local_fwd_body(x, sa, sb, omf, q, two_q)
            return x.hi, x.lo

        table_planes = []
        table_specs = []
        for m, t, w, wp in self.fwd_a + self.fwd_b:
            for pln in (w.hi, w.lo, wp.hi, wp.lo):
                table_planes.append(pln)
                table_specs.append(P("coeff"))

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(x_spec, x_spec) + tuple(table_specs),
            out_specs=(x_spec, x_spec),
            check_vma=False,
        )
        jitted = jax.jit(lambda xh, xl: fn(xh, xl, *table_planes))
        return jitted

    def _build_inv(self, imf: int, omf: int, ndim: int,
                   batch_shard: bool = True):
        mesh = self.mesh
        x_spec = self._x_spec(ndim, batch_shard)

        def body(x_hi, x_lo, *tables):
            x = U64(x_hi, x_lo)
            q = const64(self.q)
            two_q = const64(2 * self.q)
            nb = len(self.inv_b)
            sb = [(self.inv_b[i][0], self.inv_b[i][1],
                   U64(tables[4 * i][0], tables[4 * i + 1][0]),
                   U64(tables[4 * i + 2][0], tables[4 * i + 3][0]))
                  for i in range(nb)]
            off = 4 * nb
            sa = [(self.inv_a[i][0], self.inv_a[i][1],
                   U64(tables[off + 4 * i][0], tables[off + 4 * i + 1][0]),
                   U64(tables[off + 4 * i + 2][0],
                       tables[off + 4 * i + 3][0]))
                  for i in range(len(self.inv_a))]
            x = self._local_inv_body(x, sb, sa, q, two_q)
            x = self._cross_inv_body(x, q, two_q)
            if omf == 1:
                x = cond_sub64(x, q)
            return x.hi, x.lo

        table_planes = []
        table_specs = []
        for m, t, w, wp in self.inv_b + self.inv_a:
            for pln in (w.hi, w.lo, wp.hi, wp.lo):
                table_planes.append(pln)
                table_specs.append(P("coeff"))

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(x_spec, x_spec) + tuple(table_specs),
            out_specs=(x_spec, x_spec),
            check_vma=False,
        )
        return jax.jit(lambda xh, xl: fn(xh, xl, *table_planes))

    def _build_poly_mult(self, ndim: int):
        """One shard_map for the whole negacyclic product: fwd(a), fwd(b)
        lazy [0,4q), pointwise Barrett mult, inverse — a single compile
        with no intermediate host dispatches; the four all-to-alls are
        the only ICI traffic."""
        from ..eltwise import jnp_kernels as K

        mesh = self.mesh
        x_spec = self._x_spec(ndim)

        def unpack(tables, meta, off):
            out = [(meta[i][0], meta[i][1],
                    U64(tables[off + 4 * i][0], tables[off + 4 * i + 1][0]),
                    U64(tables[off + 4 * i + 2][0],
                        tables[off + 4 * i + 3][0]))
                   for i in range(len(meta))]
            return out, off + 4 * len(meta)

        def body(a_hi, a_lo, b_hi, b_lo, *tables):
            q = const64(self.q)
            two_q = const64(2 * self.q)
            fsa, off = unpack(tables, self.fwd_a, 0)
            fsb, off = unpack(tables, self.fwd_b, off)
            isb, off = unpack(tables, self.inv_b, off)
            isa, off = unpack(tables, self.inv_a, off)

            def fwd4(hi, lo):
                v = self._cross_fwd_body(U64(hi, lo), q, two_q)
                return self._local_fwd_body(v, fsa, fsb, 4, q, two_q)

            fa = fwd4(a_hi, a_lo)
            fb = fwd4(b_hi, b_lo)
            prod = K.mult_mod(fa, fb, self.q, 4)          # [0, q)
            x = self._local_inv_body(prod, isb, isa, q, two_q)
            x = self._cross_inv_body(x, q, two_q)
            x = cond_sub64(x, q)
            return x.hi, x.lo

        table_planes = []
        table_specs = []
        for m, t, w, wp in (self.fwd_a + self.fwd_b + self.inv_b
                            + self.inv_a):
            for pln in (w.hi, w.lo, wp.hi, wp.lo):
                table_planes.append(pln)
                table_specs.append(P("coeff"))

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(x_spec,) * 4 + tuple(table_specs),
            out_specs=(x_spec, x_spec),
            check_vma=False,
        )
        return jax.jit(lambda ah, al, bh, bl: fn(ah, al, bh, bl,
                                                 *table_planes))

    def poly_mult(self, a, b):
        """Sharded negacyclic product c = a*b mod (X^N+1, q); inputs
        (batch..., N) in [0, q), one fused dispatch over the mesh."""
        a_l, a_host = coerce_limbs(a)
        b_l, b_host = coerce_limbs(b)
        host = a_host or b_host
        key = ("poly", a_l.lo.ndim, config.trace_config())
        if key not in self._fwd_cache:
            self._fwd_cache[key] = self._build_poly_mult(a_l.lo.ndim)
        hi, lo = self._fwd_cache[key](a_l.hi, a_l.lo, b_l.hi, b_l.lo)
        out = U64(hi, lo)
        return from_limbs(out) if host else out

    def forward(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1, batch_shard: bool = True):
        """Sharded forward NTT; x shape (batch..., N) (host numpy or U64)."""
        host = not isinstance(x, U64)
        x_l = to_limbs(np.asarray(x, dtype=np.uint64)) if host else x
        key = (input_mod_factor, output_mod_factor, x_l.lo.ndim,
               batch_shard, config.trace_config())
        if key not in self._fwd_cache:
            self._fwd_cache[key] = self._build_fwd(
                input_mod_factor, output_mod_factor, x_l.lo.ndim,
                batch_shard)
        hi, lo = self._fwd_cache[key](x_l.hi, x_l.lo)
        out = U64(hi, lo)
        return from_limbs(out) if host else out

    def inverse(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1, batch_shard: bool = True):
        host = not isinstance(x, U64)
        x_l = to_limbs(np.asarray(x, dtype=np.uint64)) if host else x
        key = (input_mod_factor, output_mod_factor, x_l.lo.ndim,
               batch_shard, config.trace_config())
        if key not in self._inv_cache:
            self._inv_cache[key] = self._build_inv(
                input_mod_factor, output_mod_factor, x_l.lo.ndim,
                batch_shard)
        hi, lo = self._inv_cache[key](x_l.hi, x_l.lo)
        out = U64(hi, lo)
        return from_limbs(out) if host else out


# ---------------------------------------------------------------------------
# RNS convenience: the north-star pipeline (BASELINE.md) — per-prime sharded
# negacyclic products over a (batch, coeff) mesh. Primes are independent
# (the EP-like axis); each gets its own DistNTT (twiddles depend on q).
# ---------------------------------------------------------------------------

_DIST_CACHE = {}


def _mesh_key(mesh: Mesh):
    """Stable mesh identity: device ids + axis names/sizes (id(mesh) can
    be reused after garbage collection and would alias distinct meshes)."""
    return (tuple(d.id for d in mesh.devices.flat),
            tuple(mesh.shape.items()))


def get_dist_ntt(degree: int, modulus: int, mesh: Mesh) -> "DistNTT":
    from .. import config as _config
    key = (degree, modulus, _mesh_key(mesh),
           max(1, _config.dist_overlap_slices()))
    if key not in _DIST_CACHE:
        _DIST_CACHE[key] = DistNTT(degree, modulus, mesh)
    return _DIST_CACHE[key]


def dist_rns_poly_mult(a, b, degree: int, moduli, mesh: Mesh):
    """c_i = a_i * b_i over Z_{q_i}[X]/(X^N + 1) for each RNS prime q_i.

    a, b: (num_primes, batch..., N) residue stacks (host numpy or U64).
    Each prime runs the fused sharded pipeline (DistNTT.poly_mult).
    """
    moduli = [int(q) for q in moduli]
    a_l, a_host = coerce_limbs(a)
    b_l, b_host = coerce_limbs(b)
    host = a_host or b_host
    outs = []
    for i, q in enumerate(moduli):
        dntt = get_dist_ntt(degree, q, mesh)
        outs.append(dntt.poly_mult(U64(a_l.hi[i], a_l.lo[i]),
                                   U64(b_l.hi[i], b_l.lo[i])))
    if host:
        return np.stack([from_limbs(o) for o in outs])
    return U64(jnp.stack([o.hi for o in outs]),
               jnp.stack([o.lo for o in outs]))
