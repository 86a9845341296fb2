"""Staged negacyclic NTT on U64 limbs — the portable XLA compute body.

Structure (TPU-first re-derivation of the reference's radix-2 transform,
hexl/ntt/ntt-radix-2.cpp, with identical lazy-reduction semantics):

  forward:  [phase A: strides N/2..128 as row-block butterflies on the
             (R, 128) view]  ->  tile transpose  ->  [phase B: strides
             64..1 as sublane butterflies with lane-varying twiddles]
             -> transpose back -> optional [0,4q)->[0,q) reduction.
  inverse:  transpose -> [phase B': strides 1..64] -> transpose back ->
             [phase A': strides 128..N/4] -> final fused stage x N^{-1}
             -> optional [0,2q)->[0,q) reduction.

Value ranges are tracked exactly as the reference does: forward butterflies
keep values in [0, 4q) (Harvey), inverse in [0, 2q). The same functions are
the bodies of the Pallas kernels; here they run as plain XLA.

The small-N (< 1024) path does flat (m, 2, t) reshapes instead — those
sizes are latency-bound anyway.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..limb import (U64, add64, cond_sub64, const64, mullo64, mulhi64,
                    mulhi64_approx, reduce_mod_lazy64, sub64)
from .plan import LANES, MIN_2D_N, NttPlan


def _shoup(x: U64, w: U64, wp: U64, q: U64) -> U64:
    """Lazy Shoup multiply with broadcastable twiddles; output in [0, 2q)."""
    q_hat = mulhi64(x, wp)
    return sub64(mullo64(x, w), mullo64(q_hat, q))


def _shoup_approx(x: U64, w: U64, wp: U64, q: U64, two_q: U64) -> U64:
    """Shoup multiply with approximate mulhi (4 fewer lane multiplies);
    the <=1 quotient error leaves [0,3q), corrected to [0,2q) by one
    conditional subtract. Agrees with _shoup mod q, not bit-for-bit in
    the lazy range (the reference's AVX512-64 semantics)."""
    q_hat = mulhi64_approx(x, wp)
    r = sub64(mullo64(x, w), mullo64(q_hat, q))
    return cond_sub64(r, two_q)


def _fwd_butterfly(xs: U64, ys: U64, w: U64, wp: U64, q: U64, two_q: U64):
    """Harvey forward butterfly: inputs [0,4q) -> outputs [0,4q)."""
    tx = cond_sub64(xs, two_q)
    t = _shoup(ys, w, wp, q)
    return add64(tx, t), sub64(add64(tx, two_q), t)


def _inv_butterfly(xs: U64, ys: U64, w: U64, wp: U64, q: U64, two_q: U64):
    """Harvey inverse butterfly: inputs [0,2q) -> outputs [0,2q)."""
    tx = cond_sub64(add64(xs, ys), two_q)
    ty = sub64(add64(xs, two_q), ys)
    return tx, _shoup(ty, w, wp, q)


def _fwd_butterfly_approx(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                          two_q: U64):
    """Forward butterfly using the approximate Shoup multiply."""
    tx = cond_sub64(xs, two_q)
    t = _shoup_approx(ys, w, wp, q, two_q)
    return add64(tx, t), sub64(add64(tx, two_q), t)


def _inv_butterfly_approx(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                          two_q: U64):
    """Inverse butterfly using the approximate Shoup multiply."""
    tx = cond_sub64(add64(xs, ys), two_q)
    ty = sub64(add64(xs, two_q), ys)
    return tx, _shoup_approx(ty, w, wp, q, two_q)


def _bflys():
    """Butterfly pair for the XLA bodies: approximate-mulhi Shoup on the
    TPU backend (reference AVX512-64 semantics, -11%% pair time measured),
    exact elsewhere (config.approx_butterflies)."""
    from .. import config as _config
    if _config.approx_butterflies():
        return _fwd_butterfly_approx, _inv_butterfly_approx
    return _fwd_butterfly, _inv_butterfly


def _split2(x: U64, axis: int, m: int, t: int) -> tuple:
    """Reshape one axis of size m*2t into (m, 2t) and return the X half
    (first t) and Y half (last t) of each block, plus a reassembly closure.

    The join uses slice+concatenate rather than stack: on Mosaic the
    concat of two halves along an existing sublane axis compiles to cheap
    copies, where a stack along a new axis forces an expensive relayout
    (~2x whole-kernel cost for ascending-stride stage orders, measured on
    v5e)."""
    def reshape_plane(p):
        shape = p.shape
        return p.reshape(shape[:axis] + (m, 2 * t) + shape[axis + 1:])
    hi = reshape_plane(x.hi)
    lo = reshape_plane(x.lo)
    sl_x = [slice(None)] * hi.ndim
    sl_y = [slice(None)] * hi.ndim
    sl_x[axis + 1] = slice(0, t)
    sl_y[axis + 1] = slice(t, 2 * t)
    xs = U64(hi[tuple(sl_x)], lo[tuple(sl_x)])
    ys = U64(hi[tuple(sl_y)], lo[tuple(sl_y)])

    def reassemble(new_x: U64, new_y: U64) -> U64:
        h = jnp.concatenate([new_x.hi, new_y.hi], axis=axis + 1)
        l = jnp.concatenate([new_x.lo, new_y.lo], axis=axis + 1)
        orig = h.shape[:axis] + (m * 2 * t,) + h.shape[axis + 2:]
        return U64(h.reshape(orig), l.reshape(orig))

    return xs, ys, reassemble


def _transpose_tiles(x: U64, tiles: int, lane_l: int) -> U64:
    """(..., R, 128) -> (..., tiles, 128, L): tile-transpose rows<->lanes."""
    def t(p):
        shape = p.shape[:-2] + (tiles, lane_l, LANES)
        return p.reshape(shape).swapaxes(-1, -2)
    return U64(t(x.hi), t(x.lo))


def _untranspose_tiles(x: U64, rows: int) -> U64:
    """(..., tiles, 128, L) -> (..., R, 128)."""
    def t(p):
        q = p.swapaxes(-1, -2)
        return q.reshape(q.shape[:-3] + (rows, LANES))
    return U64(t(x.hi), t(x.lo))


def _bcast_w(w: U64, extra_dims: int, pos: str) -> U64:
    """Insert broadcast axes into a twiddle table.

    pos='a': (m,) -> (m, 1, 1)   [phase A: broadcast over rows-in-half, lanes]
    pos='b': (tiles, nb, L) -> (tiles, nb, 1, L)  [phase B: broadcast over t]
    """
    if pos == "a":
        return U64(w.hi[:, None, None], w.lo[:, None, None])
    return U64(w.hi[:, :, None, :], w.lo[:, :, None, :])


def fwd_ntt(x: U64, plan: NttPlan, input_mod_factor: int = 1,
            output_mod_factor: int = 1) -> U64:
    """Forward negacyclic NTT of x (..., N), bit-reversed output.

    Input < IMF*q, IMF in {1,2,4}; output in [0,q) (OMF=1) or [0,4q) (OMF=4).
    """
    if input_mod_factor not in (1, 2, 4):
        raise ValueError("input_mod_factor must be 1, 2 or 4")
    if output_mod_factor not in (1, 4):
        raise ValueError("output_mod_factor must be 1 or 4")
    n, q_int = plan.n, plan.q
    q = const64(q_int)
    two_q = const64(2 * q_int)

    if n < MIN_2D_N:
        out = _fwd_small(x, plan, q, two_q)
    else:
        out = _fwd_2d(x, plan, q, two_q)
    if output_mod_factor == 1:
        out = reduce_mod_lazy64(out, q_int, 4)
    return out


def _fwd_small(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    return fwd_body_small(x, q, two_q, plan.n, plan.rop_dev, plan.prop_dev)


def fwd_body_small(x: U64, q: U64, two_q: U64, n: int, rop_dev: U64,
                   prop_dev: U64) -> U64:
    fwd_bfly, _ = _bflys()
    m = 1
    while m < n:
        t = n // (2 * m)
        xs, ys, join = _split2(x, x.lo.ndim - 1, m, t)
        w = U64(rop_dev.hi[m:2 * m], rop_dev.lo[m:2 * m])
        wp = U64(prop_dev.hi[m:2 * m], prop_dev.lo[m:2 * m])
        w = U64(w.hi[:, None], w.lo[:, None])
        wp = U64(wp.hi[:, None], wp.lo[:, None])
        nx, ny = fwd_bfly(xs, ys, w, wp, q, two_q)
        x = join(nx, ny)
        m *= 2
    return x


def _split4(x: U64, axis: int, m: int, quarter: int):
    """Reshape one axis of size m*4*quarter into (m, 4, quarter) and
    return the four quarter sub-arrays plus a reassembly closure (the
    radix-4 analogue of _split2: one concat per TWO butterfly stages,
    halving the per-stage materializations the radix-2 walker pays)."""
    def reshape_plane(p):
        shape = p.shape
        return p.reshape(shape[:axis] + (m, 4 * quarter) + shape[axis + 1:])
    hi = reshape_plane(x.hi)
    lo = reshape_plane(x.lo)
    qs = []
    for k in range(4):
        sl = [slice(None)] * hi.ndim
        sl[axis + 1] = slice(k * quarter, (k + 1) * quarter)
        qs.append(U64(hi[tuple(sl)], lo[tuple(sl)]))

    def reassemble(q0, q1, q2, q3):
        h = jnp.concatenate([q0.hi, q1.hi, q2.hi, q3.hi], axis=axis + 1)
        l = jnp.concatenate([q0.lo, q1.lo, q2.lo, q3.lo], axis=axis + 1)
        orig = h.shape[:axis] + (m * 4 * quarter,) + h.shape[axis + 2:]
        return U64(h.reshape(orig), l.reshape(orig))

    return qs, reassemble


def _fwd_radix4_step(qs, w1, wp1, w2a, wp2a, w2b, wp2b, q, two_q, bfly):
    """Two forward radix-2 levels fused (Harvey radix-4; reference:
    FwdButterflyRadix4, hexl/ntt/ntt-default.hpp:63-95). Inputs/outputs
    in [0, 4q); bit-exact equal to applying the two stages sequentially
    with the same butterfly."""
    q0, q1, q2, q3 = qs
    # Level 1 (stride 2*quarter): (q0,q2) and (q1,q3) with w1.
    a0, c0 = bfly(q0, q2, w1, wp1, q, two_q)
    b0, d0 = bfly(q1, q3, w1, wp1, q, two_q)
    # Level 2 (stride quarter): (a,b) with w2 even, (c,d) with w2 odd.
    a1, b1 = bfly(a0, b0, w2a, wp2a, q, two_q)
    c1, d1 = bfly(c0, d0, w2b, wp2b, q, two_q)
    return a1, b1, c1, d1


def _splitk(x: U64, axis: int, m: int, k: int, part: int):
    """Reshape one axis of size m*k*part into (m, k, part) and return the
    k part sub-arrays plus a reassembly closure (radix-2^log2(k) walker:
    one concat per log2(k) butterfly stages)."""
    def reshape_plane(p):
        shape = p.shape
        return p.reshape(shape[:axis] + (m, k * part) + shape[axis + 1:])
    hi = reshape_plane(x.hi)
    lo = reshape_plane(x.lo)
    parts = []
    for j in range(k):
        sl = [slice(None)] * hi.ndim
        sl[axis + 1] = slice(j * part, (j + 1) * part)
        parts.append(U64(hi[tuple(sl)], lo[tuple(sl)]))

    def reassemble(*outs):
        h = jnp.concatenate([o.hi for o in outs], axis=axis + 1)
        l = jnp.concatenate([o.lo for o in outs], axis=axis + 1)
        orig = h.shape[:axis] + (m * k * part,) + h.shape[axis + 2:]
        return U64(h.reshape(orig), l.reshape(orig))

    return parts, reassemble


def _fwd_radix8_step(es, w1, wp1, w2, wp2, w3, wp3, q, two_q, bfly):
    """Three forward radix-2 levels fused. w1 broadcast per block;
    w2 = (even, odd) pair; w3 = 4-tuple of interleaved quarters.
    Bit-exact equal to the three stages applied sequentially."""
    e = list(es)
    # Level 1 (stride 4*part): (e_i, e_{i+4}) share w1.
    for i in range(4):
        e[i], e[i + 4] = bfly(e[i], e[i + 4], w1, wp1, q, two_q)
    # Level 2 (stride 2*part): halves use w2 even/odd.
    for base, wi, wpi in ((0, w2[0], wp2[0]), (4, w2[1], wp2[1])):
        for i in (base, base + 1):
            e[i], e[i + 2] = bfly(e[i], e[i + 2], wi, wpi, q, two_q)
    # Level 3 (stride part): adjacent pairs use w3 quarters.
    for j in range(4):
        i = 2 * j
        e[i], e[i + 1] = bfly(e[i], e[i + 1], w3[j], wp3[j], q, two_q)
    return e


def _inv_radix8_step(es, w1, wp1, w2, wp2, w3, wp3, q, two_q, bfly):
    """Three inverse radix-2 levels fused (ascending strides): w1 =
    4-tuple (innermost stage), w2 = (even, odd), w3 broadcast."""
    e = list(es)
    for j in range(4):
        i = 2 * j
        e[i], e[i + 1] = bfly(e[i], e[i + 1], w1[j], wp1[j], q, two_q)
    for base, wi, wpi in ((0, w2[0], wp2[0]), (4, w2[1], wp2[1])):
        for i in (base, base + 1):
            e[i], e[i + 2] = bfly(e[i], e[i + 2], wi, wpi, q, two_q)
    for i in range(4):
        e[i], e[i + 4] = bfly(e[i], e[i + 4], w3, wp3, q, two_q)
    return e


def _quads_a(w: U64, m: int):
    """Stage-(4m) phase-A table (4m,) -> 4 interleaved (m,1,1) slices."""
    hi = w.hi.reshape(m, 4)
    lo = w.lo.reshape(m, 4)
    return [U64(hi[:, j][:, None, None], lo[:, j][:, None, None])
            for j in range(4)]


def _quads_b(w: U64, nb: int):
    """Stage table (tiles, 4nb, L) -> 4 interleaved (tiles, nb, 1, L)."""
    hi = w.hi.reshape(w.hi.shape[0], nb, 4, w.hi.shape[2])
    lo = w.lo.reshape(w.lo.shape[0], nb, 4, w.lo.shape[2])
    return [U64(hi[:, :, j][:, :, None, :], lo[:, :, j][:, :, None, :])
            for j in range(4)]


def _even_odd_a(w: U64, m: int):
    """Stage-(2m) phase-A table (2m,) -> even/odd halves as (m,1,1)."""
    hi = w.hi.reshape(m, 2)
    lo = w.lo.reshape(m, 2)
    return (U64(hi[:, 0][:, None, None], lo[:, 0][:, None, None]),
            U64(hi[:, 1][:, None, None], lo[:, 1][:, None, None]))


def _even_odd_b(w: U64, nb: int):
    """Stage-(2nb) phase-B table (tiles, 2nb, L) -> even/odd as
    (tiles, nb, 1, L)."""
    hi = w.hi.reshape(w.hi.shape[0], nb, 2, w.hi.shape[2])
    lo = w.lo.reshape(w.lo.shape[0], nb, 2, w.lo.shape[2])
    return (U64(hi[:, :, 0][:, :, None, :], lo[:, :, 0][:, :, None, :]),
            U64(hi[:, :, 1][:, :, None, :], lo[:, :, 1][:, :, None, :]))


def _fwd_2d(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    from .. import config as _config
    radix = _config.ntt_radix() if plan.n >= (1 << 13) else 2
    return fwd_body_2d(x, q, two_q, plan.fwd_a, plan.fwd_b, plan.rows,
                       plan.tiles, plan.lane_l, radix)


def fwd_body_2d(x: U64, q: U64, two_q: U64, fwd_a, fwd_b, rows: int,
                tiles: int, lane_l: int, radix: int) -> U64:
    """Table-parameterized 2D forward body: q/two_q and the stage tables
    are operands (traced under vmap for the stacked multi-modulus path,
    ntt/rns.py), everything else static."""
    shape = x.lo.shape
    x = U64(x.hi.reshape(shape[:-1] + (rows, LANES)),
            x.lo.reshape(shape[:-1] + (rows, LANES)))
    row_axis = x.lo.ndim - 2
    fwd_bfly, _ = _bflys()
    # Phase A: strides >= 128 pair row blocks; the radix-4/8 walkers fuse
    # 2/3 stages per materialization (the XLA path is stage-round-trip
    # bound, so this divides phase HBM traffic by the fusion factor).
    stages_a = list(fwd_a)
    i = 0
    while i < len(stages_a):
        m, t, w, wp = stages_a[i]
        take = 1
        if radix >= 8 and i + 2 < len(stages_a):
            take = 3
        elif radix >= 4 and i + 1 < len(stages_a):
            take = 2
        if take == 3:
            m2, t2, w2, wp2 = stages_a[i + 1]
            m3, t3, w3, wp3 = stages_a[i + 2]
            es, join = _splitk(x, row_axis, m, 8, t3 // LANES)
            outs = _fwd_radix8_step(
                es, _bcast_w(w, 0, "a"), _bcast_w(wp, 0, "a"),
                _even_odd_a(w2, m2 // 2), _even_odd_a(wp2, m2 // 2),
                _quads_a(w3, m3 // 4), _quads_a(wp3, m3 // 4),
                q, two_q, fwd_bfly)
            x = join(*outs)
            i += 3
            continue
        if take == 2:
            m2, t2, w2, wp2 = stages_a[i + 1]
            qs, join = _split4(x, row_axis, m, t2 // LANES)
            w2a, w2b = _even_odd_a(w2, m2 // 2)
            wp2a, wp2b = _even_odd_a(wp2, m2 // 2)
            outs = _fwd_radix4_step(qs, _bcast_w(w, 0, "a"),
                                    _bcast_w(wp, 0, "a"),
                                    w2a, wp2a, w2b, wp2b, q, two_q,
                                    fwd_bfly)
            x = join(*outs)
            i += 2
            continue
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = fwd_bfly(xs, ys, _bcast_w(w, 0, "a"),
                          _bcast_w(wp, 0, "a"), q, two_q)
        x = join(nx, ny)
        i += 1
    # Phase B: transpose tiles, strides 64..1 pair sublane blocks.
    x = _transpose_tiles(x, tiles, lane_l)
    c_axis = x.lo.ndim - 2
    stages_b = list(fwd_b)
    i = 0
    while i < len(stages_b):
        m, t, w, wp = stages_b[i]
        nb = LANES // (2 * t)
        take = 1
        if radix >= 8 and i + 2 < len(stages_b):
            take = 3
        elif radix >= 4 and i + 1 < len(stages_b):
            take = 2
        if take == 3:
            m2, t2, w2, wp2 = stages_b[i + 1]
            m3, t3, w3, wp3 = stages_b[i + 2]
            es, join = _splitk(x, c_axis, nb, 8, t3)
            outs = _fwd_radix8_step(
                es, _bcast_w(w, 0, "b"), _bcast_w(wp, 0, "b"),
                _even_odd_b(w2, nb), _even_odd_b(wp2, nb),
                _quads_b(w3, nb), _quads_b(wp3, nb),
                q, two_q, fwd_bfly)
            x = join(*outs)
            i += 3
            continue
        if take == 2:
            m2, t2, w2, wp2 = stages_b[i + 1]
            qs, join = _split4(x, c_axis, nb, t2)
            w2a, w2b = _even_odd_b(w2, nb * 2 // 2)
            wp2a, wp2b = _even_odd_b(wp2, nb * 2 // 2)
            outs = _fwd_radix4_step(qs, _bcast_w(w, 0, "b"),
                                    _bcast_w(wp, 0, "b"),
                                    w2a, wp2a, w2b, wp2b, q, two_q,
                                    fwd_bfly)
            x = join(*outs)
            i += 2
            continue
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = fwd_bfly(xs, ys, _bcast_w(w, 0, "b"),
                          _bcast_w(wp, 0, "b"), q, two_q)
        x = join(nx, ny)
        i += 1
    x = _untranspose_tiles(x, rows)
    return U64(x.hi.reshape(shape), x.lo.reshape(shape))


def inv_ntt(x: U64, plan: NttPlan, input_mod_factor: int = 1,
            output_mod_factor: int = 1) -> U64:
    """Inverse negacyclic NTT from bit-reversed input (..., N).

    Input < IMF*q, IMF in {1,2}; output in [0,q) (OMF=1) or [0,2q) (OMF=2).
    """
    if input_mod_factor not in (1, 2):
        raise ValueError("input_mod_factor must be 1 or 2")
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    n, q_int = plan.n, plan.q
    q = const64(q_int)
    two_q = const64(2 * q_int)

    if n < MIN_2D_N:
        out = _inv_small(x, plan, q, two_q)
    else:
        out = _inv_2d(x, plan, q, two_q)
    if output_mod_factor == 1:
        out = cond_sub64(out, q)
    return out


def _final_inv_stage_fin(xs: U64, ys: U64, fin, q: U64,
                         two_q: U64) -> tuple:
    """Last butterfly stage fused with x N^{-1}; `fin` is the traced
    4-tuple (inv_n, inv_n_precon, inv_n_w, inv_n_w_precon) as U64s."""
    inv_n, inv_n_precon, inv_n_w, inv_n_w_precon = fin
    tx = cond_sub64(add64(xs, ys), two_q)
    ty = sub64(add64(xs, two_q), ys)
    nx = _shoup(tx, inv_n, inv_n_precon, q)
    ny = _shoup(ty, inv_n_w, inv_n_w_precon, q)
    return nx, ny


def _plan_fin(plan: NttPlan):
    return (const64(plan.inv_n), const64(plan.inv_n_precon),
            const64(plan.inv_n_w), const64(plan.inv_n_w_precon))


def _final_inv_stage(xs: U64, ys: U64, plan: NttPlan, q: U64,
                     two_q: U64) -> tuple:
    """Last butterfly stage fused with multiplication by N^{-1}."""
    return _final_inv_stage_fin(xs, ys, _plan_fin(plan), q, two_q)


def _inv_small(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    return inv_body_small(x, q, two_q, plan.n, plan.irop_dev,
                          plan.pirop_dev, _plan_fin(plan))


def inv_body_small(x: U64, q: U64, two_q: U64, n: int, irop_dev: U64,
                   pirop_dev: U64, fin) -> U64:
    _, inv_bfly = _bflys()
    axis = x.lo.ndim - 1
    root_index = 1
    t = 1
    while t < n // 2:
        m = n // (2 * t)
        xs, ys, join = _split2(x, axis, m, t)
        w = U64(irop_dev.hi[root_index:root_index + m],
                irop_dev.lo[root_index:root_index + m])
        wp = U64(pirop_dev.hi[root_index:root_index + m],
                 pirop_dev.lo[root_index:root_index + m])
        w = U64(w.hi[:, None], w.lo[:, None])
        wp = U64(wp.hi[:, None], wp.lo[:, None])
        nx, ny = inv_bfly(xs, ys, w, wp, q, two_q)
        x = join(nx, ny)
        root_index += m
        t *= 2
    xs, ys, join = _split2(x, axis, 1, n // 2)
    nx, ny = _final_inv_stage_fin(xs, ys, fin, q, two_q)
    return join(nx, ny)


def _inv_radix4_step(qs, w1a, wp1a, w1b, wp1b, w2, wp2, q, two_q, bfly):
    """Two inverse radix-2 levels fused (mirror of _fwd_radix4_step;
    reference: InvButterflyRadix4, ntt-default.hpp:128-156)."""
    q0, q1, q2, q3 = qs
    # Level 1 (stride quarter): (q0,q1) w1 even, (q2,q3) w1 odd.
    a0, b0 = bfly(q0, q1, w1a, wp1a, q, two_q)
    c0, d0 = bfly(q2, q3, w1b, wp1b, q, two_q)
    # Level 2 (stride 2*quarter): (a,c) and (b,d) share w2.
    a1, c1 = bfly(a0, c0, w2, wp2, q, two_q)
    b1, d1 = bfly(b0, d0, w2, wp2, q, two_q)
    return a1, b1, c1, d1


def _inv_2d(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    from .. import config as _config
    radix = _config.ntt_radix() if plan.n >= (1 << 13) else 2
    return inv_body_2d(x, q, two_q, plan.inv_b, plan.inv_a, _plan_fin(plan),
                       plan.rows, plan.tiles, plan.lane_l, radix)


def inv_body_2d(x: U64, q: U64, two_q: U64, inv_b, inv_a, fin, rows: int,
                tiles: int, lane_l: int, radix: int) -> U64:
    """Table-parameterized 2D inverse body (see fwd_body_2d)."""
    shape = x.lo.shape
    x = U64(x.hi.reshape(shape[:-1] + (rows, LANES)),
            x.lo.reshape(shape[:-1] + (rows, LANES)))
    _, inv_bfly = _bflys()
    # Phase B first (strides 1..64) in the transposed layout.
    x = _transpose_tiles(x, tiles, lane_l)
    c_axis = x.lo.ndim - 2
    stages_b = list(inv_b)
    i = 0
    while i < len(stages_b):
        m, t, w, wp = stages_b[i]
        nb = LANES // (2 * t)
        take = 1
        if radix >= 8 and i + 2 < len(stages_b):
            take = 3
        elif radix >= 4 and i + 1 < len(stages_b):
            take = 2
        if take == 3:
            m2, t2, w2, wp2 = stages_b[i + 1]   # stride 2t, nb/2 blocks
            m3, t3, w3, wp3 = stages_b[i + 2]   # stride 4t, nb/4 blocks
            es, join = _splitk(x, c_axis, nb // 4, 8, t)
            outs = _inv_radix8_step(
                es, _quads_b(w, nb // 4), _quads_b(wp, nb // 4),
                _even_odd_b(w2, nb // 4), _even_odd_b(wp2, nb // 4),
                _bcast_w(w3, 0, "b"), _bcast_w(wp3, 0, "b"),
                q, two_q, inv_bfly)
            x = join(*outs)
            i += 3
            continue
        if take == 2:
            m2, t2, w2, wp2 = stages_b[i + 1]   # stride 2t, nb/2 blocks
            qs, join = _split4(x, c_axis, nb // 2, t)
            w1a, w1b = _even_odd_b(w, nb // 2)
            wp1a, wp1b = _even_odd_b(wp, nb // 2)
            outs = _inv_radix4_step(qs, w1a, wp1a, w1b, wp1b,
                                    _bcast_w(w2, 0, "b"),
                                    _bcast_w(wp2, 0, "b"), q, two_q,
                                    inv_bfly)
            x = join(*outs)
            i += 2
            continue
        xs, ys, join = _split2(x, c_axis, nb, t)
        nx, ny = inv_bfly(xs, ys, _bcast_w(w, 0, "b"),
                          _bcast_w(wp, 0, "b"), q, two_q)
        x = join(nx, ny)
        i += 1
    x = _untranspose_tiles(x, rows)
    # Phase A (strides 128 .. N/4) on row blocks.
    row_axis = x.lo.ndim - 2
    stages_a = list(inv_a)
    i = 0
    while i < len(stages_a):
        m, t, w, wp = stages_a[i]
        take = 1
        if radix >= 8 and i + 2 < len(stages_a):
            take = 3
        elif radix >= 4 and i + 1 < len(stages_a):
            take = 2
        if take == 3:
            m2, t2, w2, wp2 = stages_a[i + 1]
            m3, t3, w3, wp3 = stages_a[i + 2]
            es, join = _splitk(x, row_axis, m // 4, 8, t // LANES)
            outs = _inv_radix8_step(
                es, _quads_a(w, m // 4), _quads_a(wp, m // 4),
                _even_odd_a(w2, m // 4), _even_odd_a(wp2, m // 4),
                _bcast_w(w3, 0, "a"), _bcast_w(wp3, 0, "a"),
                q, two_q, inv_bfly)
            x = join(*outs)
            i += 3
            continue
        if take == 2:
            m2, t2, w2, wp2 = stages_a[i + 1]
            qs, join = _split4(x, row_axis, m // 2, t // LANES)
            w1a, w1b = _even_odd_a(w, m // 2)
            wp1a, wp1b = _even_odd_a(wp, m // 2)
            outs = _inv_radix4_step(qs, w1a, wp1a, w1b, wp1b,
                                    _bcast_w(w2, 0, "a"),
                                    _bcast_w(wp2, 0, "a"), q, two_q,
                                    inv_bfly)
            x = join(*outs)
            i += 2
            continue
        xs, ys, join = _split2(x, row_axis, m, t // LANES)
        nx, ny = inv_bfly(xs, ys, _bcast_w(w, 0, "a"),
                          _bcast_w(wp, 0, "a"), q, two_q)
        x = join(nx, ny)
        i += 1
    # Final fused stage pairs row r with row r + R/2.
    half = rows // 2
    sl = [slice(None)] * x.lo.ndim
    sl_x, sl_y = list(sl), list(sl)
    sl_x[row_axis] = slice(0, half)
    sl_y[row_axis] = slice(half, rows)
    xs = U64(x.hi[tuple(sl_x)], x.lo[tuple(sl_x)])
    ys = U64(x.hi[tuple(sl_y)], x.lo[tuple(sl_y)])
    nx, ny = _final_inv_stage_fin(xs, ys, fin, q, two_q)
    hi = jnp.concatenate([nx.hi, ny.hi], axis=row_axis)
    lo = jnp.concatenate([nx.lo, ny.lo], axis=row_axis)
    return U64(hi.reshape(shape), lo.reshape(shape))
