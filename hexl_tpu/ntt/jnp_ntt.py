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

from ..limb import (U64, add64, cond_sub64_half, const64, mullo64,
                    mulhi64, mulhi64_approx2, mulhi64_approx6,
                    reduce_mod_lazy64, sub64)
from .plan import LANES, MIN_2D_N, NttPlan

# Largest modulus the lean approximate butterflies are valid for: their
# raw Shoup product lies in [0, 8q), which must fit in 64 bits.
LEAN_APPROX_MAX_Q = 1 << 61

# Largest modulus for the widened-invariant lean16 scheme: the forward
# body carries values in [0, 16q) (ONE conditional subtract per
# butterfly), so 16q must fit in 64 bits.
LEAN16_MAX_Q = 1 << 60

# Smallest degree lean16 actually beats lean8 at (measured, TPU v5e:
# benchmarks/smalln_49_profile_results.json). Below this the transform
# is layout-bound and lean16's wider invariant costs more than its
# saved halver buys — the round-4 "49-bit small-N inversion": forcing
# lean16 wherever it was VALID made the 49-bit family slower than the
# 60-bit family at N <= 2^12. The gate is backend-independent so the
# CPU suite exercises the schemes the TPU runs.
LEAN16_MIN_N = 1 << 13


def scheme_gates(q_max: int, n: int) -> tuple:
    """(lean_ok, lean16_ok) for a degree-n body whose largest modulus is
    q_max — the single place the scheme map lives. lean16 requires both
    validity (16q fits u64) and the measured size threshold; lean8 is
    the widest approximate family (8q fits u64). _bflys3 maps the pair
    to 'lean16' / 'lean8' / 'exact'."""
    return (q_max < LEAN_APPROX_MAX_Q,
            q_max < LEAN16_MAX_Q and n >= LEAN16_MIN_N)


def _shoup(x: U64, w: U64, wp: U64, q: U64) -> U64:
    """Lazy Shoup multiply with broadcastable twiddles; output in [0, 2q)."""
    q_hat = mulhi64(x, wp)
    return sub64(mullo64(x, w), mullo64(q_hat, q))


def _shoup_approx(x: U64, w: U64, wp: U64, q: U64, two_q: U64) -> U64:
    """Lean Shoup multiply via the e<=6 approximate mulhi; output [0,2q).

    The quotient may be up to 6 too small, so the raw product lies in
    [0, 8q) (fits 64 bits for q < LEAN_APPROX_MAX_Q = 2^61) and a 4q then
    2q conditional-subtract chain restores the lazy range. Agrees with
    _shoup mod q, not bit-for-bit in the lazy range (the reference's
    AVX512-64 approx-mulhi semantics, avx512-util.hpp:153-185, traded
    further toward fewer ops: 10 quotient multiplies vs its analogue's
    12, measured +19%% butterfly throughput on v5e)."""
    q_hat = mulhi64_approx6(x, wp)
    r = sub64(mullo64(x, w), mullo64(q_hat, q))
    four_q = add64(two_q, two_q)  # stage-invariant; hoisted by XLA
    return cond_sub64_half(cond_sub64_half(r, four_q), two_q)


def _fwd_butterfly(xs: U64, ys: U64, w: U64, wp: U64, q: U64, two_q: U64):
    """Harvey forward butterfly: inputs [0,4q) -> outputs [0,4q)."""
    tx = cond_sub64_half(xs, two_q)
    t = _shoup(ys, w, wp, q)
    return add64(tx, t), sub64(add64(tx, two_q), t)


def _inv_butterfly(xs: U64, ys: U64, w: U64, wp: U64, q: U64, two_q: U64):
    """Harvey inverse butterfly: inputs [0,2q) -> outputs [0,2q)."""
    tx = cond_sub64_half(add64(xs, ys), two_q)
    ty = sub64(add64(xs, two_q), ys)
    return tx, _shoup(ty, w, wp, q)


def _fwd_butterfly_approx(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                          two_q: U64):
    """Forward butterfly using the lean approximate Shoup multiply
    (valid for q < LEAN_APPROX_MAX_Q)."""
    tx = cond_sub64_half(xs, two_q)
    t = _shoup_approx(ys, w, wp, q, two_q)
    return add64(tx, t), sub64(add64(tx, two_q), t)


def _inv_butterfly_approx(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                          two_q: U64):
    """Inverse butterfly using the lean approximate Shoup multiply
    (valid for q < LEAN_APPROX_MAX_Q)."""
    tx = cond_sub64_half(add64(xs, ys), two_q)
    ty = sub64(add64(xs, two_q), ys)
    return tx, _shoup_approx(ty, w, wp, q, two_q)


def _fwd_butterfly_lean16(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                          two_q: U64):
    """Forward butterfly on the widened [0,16q) invariant (q < 2^60):
    ONE range-halving conditional subtract per butterfly.

    The Shoup quotient bound holds for ANY 64-bit multiplicand (the
    preconditioning error x*frac(w*2^64/q)/2^64 is < 1 for all x < 2^64),
    so the multiply input needs no range control at all; with the e<=6
    approximate quotient its raw output lies in [0, 8q). Only the X leg
    is halved, [0,16q) -> [0,8q), and both outputs land back in [0,16q).
    Bodies using this scheme must reduce the final output
    [0,16q) -> [0,4q) to restore the OMF=4 contract (two halvers, paid
    once per transform instead of twice per butterfly)."""
    four_q = add64(two_q, two_q)          # stage-invariant; hoisted
    eight_q = add64(four_q, four_q)
    tx = cond_sub64_half(xs, eight_q)              # [0,16q) -> [0,8q)
    q_hat = mulhi64_approx6(ys, wp)
    t = sub64(mullo64(ys, w), mullo64(q_hat, q))   # [0,8q)
    return add64(tx, t), sub64(add64(tx, eight_q), t)


def _inv_butterfly_lean4(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                         two_q: U64):
    """Inverse butterfly on the widened [0,4q) invariant (q < 2^61):
    TWO range-halving conditional subtracts (the classic form needs
    three). The Shoup input ty needs no reduction (any u64 is valid);
    the raw e<=6 product in [0,8q) is halved once to [0,4q).

    The e<=2 quotient alternative (mulhi64_approx2: raw in [0,4q), NO
    post-multiply halver, +2 lane muls) measures 1.20x on the ISOLATED
    inverse chain (benchmarks/butterfly_variants_ab.py 2026-08-21) but
    REGRESSES the full staged transform 16% (9.09-9.35 vs 7.80 us/pair
    at 2^14/60b across radixes) — the single-twiddle register-resident
    chain hides the table-load/layout interleaving where the halver ops
    were free and the extra multiplies are not. Kept on e<=6."""
    four_q = add64(two_q, two_q)
    tx = cond_sub64_half(add64(xs, ys), four_q)    # [0,8q) -> [0,4q)
    ty = sub64(add64(xs, four_q), ys)              # (0,8q)
    q_hat = mulhi64_approx6(ty, wp)
    r = sub64(mullo64(ty, w), mullo64(q_hat, q))   # [0,8q)
    return tx, cond_sub64_half(r, four_q)          # [0,4q)


def _fwd_butterfly_lean8(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                         two_q: U64):
    """Forward butterfly on the widened [0,8q) invariant (q < 2^61):
    TWO range-halving conditional subtracts (the classic 'lean' form
    needs three; lean16's single-halver form needs 16q < 2^64 and is
    out of reach here).

    The Shoup quotient bound holds for ANY 64-bit multiplicand, so ys
    in [0,8q) feeds the multiply unreduced; the raw e<=6 product lies
    in [0,8q) and is halved once to [0,4q), the X leg halved once
    [0,8q) -> [0,4q), and both outputs land back in [0,8q). Bodies
    using this scheme must reduce the final output [0,8q) -> [0,4q) to
    restore the OMF=4 contract (one halver, paid once per transform)."""
    four_q = add64(two_q, two_q)          # stage-invariant; hoisted
    tx = cond_sub64_half(xs, four_q)               # [0,8q) -> [0,4q)
    q_hat = mulhi64_approx6(ys, wp)
    t = sub64(mullo64(ys, w), mullo64(q_hat, q))   # [0,8q)
    t = cond_sub64_half(t, four_q)                 # [0,4q)
    return add64(tx, t), sub64(add64(tx, four_q), t)


def _inv_butterfly_lean8(xs: U64, ys: U64, w: U64, wp: U64, q: U64,
                         two_q: U64):
    """Inverse butterfly on the widened [0,8q) invariant (q < 2^60):
    ONE range-halving conditional subtract. The sum xs + ys lies in
    [0,16q) (fits u64 while q < 2^60) and is halved once; ty needs no
    reduction (any u64 is a valid Shoup multiplicand) and the raw e<=6
    product in [0,8q) already satisfies the invariant. Bodies using
    this scheme must run a final stage that accepts [0,8q) inputs
    (_final_inv_stage_lean8)."""
    four_q = add64(two_q, two_q)
    eight_q = add64(four_q, four_q)
    tx = cond_sub64_half(add64(xs, ys), eight_q)   # [0,16q) -> [0,8q)
    ty = sub64(add64(xs, eight_q), ys)             # (0,16q)
    q_hat = mulhi64_approx6(ty, wp)
    return tx, sub64(mullo64(ty, w), mullo64(q_hat, q))  # [0,8q)


def _bflys3(lean_ok: bool, lean16_ok: bool):
    """(fwd_bfly, inv_bfly, scheme) for the XLA bodies.

    scheme: 'lean16' (fwd invariant [0,16q) / inv [0,8q), one halver
    per butterfly each direction, q < 2^60), 'lean8' (fwd [0,8q) / inv
    [0,4q), two halvers each direction, q < 2^61 — the widest family
    the e<=6 raw Shoup range 8q fits 64 bits for), or 'exact' (the
    bit-exact Harvey oracle path, also the q >= 2^61 fallback).
    The widened invariants change lazy-range values (mod-q equal);
    bodies must apply the matching final fixups/final stages."""
    from .. import config as _config
    if not _config.approx_butterflies():
        return _fwd_butterfly, _inv_butterfly, "exact"
    if lean16_ok:
        return _fwd_butterfly_lean16, _inv_butterfly_lean8, "lean16"
    if lean_ok:
        return _fwd_butterfly_lean8, _inv_butterfly_lean4, "lean8"
    return _fwd_butterfly, _inv_butterfly, "exact"


def _bflys(lean_ok: bool = False):
    """Butterfly pair for the XLA bodies.

    lean_ok must be True only when every modulus the body will run is
    < LEAN_APPROX_MAX_Q (2^61) — the lean approximate butterflies' raw
    Shoup range [0,8q) must fit 64 bits. With it, the TPU backend uses
    the e<=6 approx-mulhi butterflies (reference AVX512-64 semantics:
    mod-q equal, lazy values not bit-identical); everywhere else the
    exact Harvey forms (the bit-exactness oracle)."""
    from .. import config as _config
    if lean_ok and _config.approx_butterflies():
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


def _pack_b(x: U64, kb: int, lane_l: int) -> U64:
    """(B, rows, 128) -> (B/kb, 1, 128, kb*L): the tile transpose with
    kb polynomials packed side by side into the lane axis. For
    lane_l < 128 the plain transposed layout wastes (128-lane_l)/128
    of every vector op and HBM tile on padding; packing restores full
    tiles at the SAME materialization count (replaces _transpose_tiles;
    pure lane permutation, bit-identical — the fft_like._t_pack_b
    scheme, measured there as the main small-N lever)."""
    def t(p):
        b = p.shape[0] // kb
        v = p.reshape(b, kb, lane_l, LANES)
        return v.transpose(0, 3, 1, 2).reshape(b, 1, LANES, kb * lane_l)
    return U64(t(x.hi), t(x.lo))


def _unpack_b(x: U64, kb: int, lane_l: int) -> U64:
    """Inverse of _pack_b: (B/kb, 1, 128, kb*L) -> (B, rows, 128)."""
    def t(p):
        b = p.shape[0]
        v = p.reshape(b, LANES, kb, lane_l).transpose(0, 2, 3, 1)
        return v.reshape(b * kb, lane_l, LANES)
    return U64(t(x.hi), t(x.lo))


def _tile_stages_b(stages, kb: int):
    """Tile phase-B stage tables (1, nb, L) -> (1, nb, kb*L) for the
    packed walk (packed lane j*L + l carries poly j's element l, which
    consumes the same twiddle as the unpacked element l)."""
    def rep(p):
        return jnp.tile(p, (1, 1, kb))
    return [(m, t, U64(rep(w.hi), rep(w.lo)),
             U64(rep(wp.hi), rep(wp.lo))) for m, t, w, wp in stages]


def _pack_kb_ntt(x: U64, tiles: int, lane_l: int) -> int:
    """Packing factor for the phase-B walk, or 1 when inapplicable
    (multi-tile layouts, no single flat batch axis, batch not
    divisible, packing disabled). In 'auto' mode only the measured-win
    size classes pack (config.ntt_pack)."""
    from .. import config as _config
    mode = _config.ntt_pack()
    if tiles != 1 or lane_l >= LANES or mode == "0":
        return 1
    if mode == "auto" and (lane_l not in (32, 64)
                           or _config.default_backend() != "tpu"):
        return 1
    lead = x.lo.shape[:-2]
    if len(lead) != 1:
        return 1
    kb = LANES // lane_l
    return kb if lead[0] % kb == 0 else 1


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
    lean_ok, lean16_ok = scheme_gates(plan.q, plan.n)
    return fwd_body_small(x, q, two_q, plan.n, plan.rop_dev, plan.prop_dev,
                          lean_ok=lean_ok, lean16_ok=lean16_ok)


def _fwd_fixup(x: U64, scheme: str, two_q: U64) -> U64:
    """Restore the forward OMF=4 output contract [0,4q) from the body's
    internal invariant ([0,16q) under lean16, [0,8q) under lean8):
    one or two range halvers, paid once per transform."""
    if scheme == "lean16":
        four_q = add64(two_q, two_q)
        eight_q = add64(four_q, four_q)
        return cond_sub64_half(cond_sub64_half(x, eight_q), four_q)
    if scheme == "lean8":
        return cond_sub64_half(x, add64(two_q, two_q))
    return x


def fwd_body_small(x: U64, q: U64, two_q: U64, n: int, rop_dev: U64,
                   prop_dev: U64, lean_ok: bool = False,
                   lean16_ok: bool = False) -> U64:
    fwd_bfly, _, scheme = _bflys3(lean_ok, lean16_ok)
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
    return _fwd_fixup(x, scheme, two_q)


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


def _parts_a(w: U64, m: int, parts: int):
    """Phase-A stage table (m*parts,) -> `parts` interleaved (m,1,1)
    slices (part g holds the twiddles the g-th butterfly group of a
    fused level consumes)."""
    if parts == 1:
        return [U64(w.hi[:, None, None], w.lo[:, None, None])]
    hi = w.hi.reshape(m, parts)
    lo = w.lo.reshape(m, parts)
    return [U64(hi[:, j][:, None, None], lo[:, j][:, None, None])
            for j in range(parts)]


def _parts_b(w: U64, nb: int, parts: int):
    """Phase-B stage table (tiles, nb*parts, L) -> `parts` interleaved
    (tiles, nb, 1, L) slices."""
    if parts == 1:
        return [U64(w.hi[:, :, None, :], w.lo[:, :, None, :])]
    hi = w.hi.reshape(w.hi.shape[0], nb, parts, w.hi.shape[2])
    lo = w.lo.reshape(w.lo.shape[0], nb, parts, w.lo.shape[2])
    return [U64(hi[:, :, j][:, :, None, :], lo[:, :, j][:, :, None, :])
            for j in range(parts)]


def _fwd_radixk_step(es, wparts, wpparts, q, two_q, bfly):
    """L = log2(len(es)) forward radix-2 levels fused over a block list
    (descending strides). wparts[j] holds the 2^j twiddle parts of fused
    level j. Bit-exact equal to applying the L stages sequentially with
    the same butterfly (generalizes the reference's FwdButterflyRadix4,
    hexl/ntt/ntt-default.hpp:63-95, to arbitrary power-of-two radix)."""
    e = list(es)
    k = len(e)
    log_k = k.bit_length() - 1
    for j in range(log_k):
        half = k >> (j + 1)
        for base in range(0, k, 2 * half):
            g = base >> (log_k - j)
            for i in range(base, base + half):
                e[i], e[i + half] = bfly(e[i], e[i + half], wparts[j][g],
                                         wpparts[j][g], q, two_q)
    return e


def _inv_radixk_step(es, wparts, wpparts, q, two_q, bfly):
    """Mirror of _fwd_radixk_step: L inverse radix-2 levels fused,
    ascending strides; wparts[j] holds the 2^(L-1-j)... i.e. k>>(j+1)
    twiddle parts of fused level j."""
    e = list(es)
    k = len(e)
    for j in range(k.bit_length() - 1):
        half = 1 << j
        for base in range(0, k, 2 * half):
            g = base >> (j + 1)
            for i in range(base, base + half):
                e[i], e[i + half] = bfly(e[i], e[i + half], wparts[j][g],
                                         wpparts[j][g], q, two_q)
    return e


def _fwd_2d(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    radix = ntt_radix_for(plan.n)
    lean_ok, lean16_ok = scheme_gates(plan.q, plan.n)
    return fwd_body_2d(x, q, two_q, plan.fwd_a, plan.fwd_b, plan.rows,
                       plan.tiles, plan.lane_l, radix,
                       lean_ok=lean_ok, lean16_ok=lean16_ok)


def _norm_radix(radix):
    """Accept int (both phases) or (radix_a, radix_b) pair."""
    if isinstance(radix, int):
        return radix, radix
    return radix


# Measured per-size stage-fusion defaults for the TPU backend (upper
# bound n -> (radix_a, radix_b)); generated from the committed
# dispatch_sweep_results.json (benchmarks/dispatch_sweep.py). The
# lean8 butterflies' lower register pressure moved the optimum deep:
# at 2^14/60b (32,16) measures 7.80 us/pair vs 8.82 for the round-3
# default (4,8); whole-phase fusion still collapses (128,128: 1013 us).
_TPU_NTT_RADIX_DEFAULTS = (
    (1 << 13, (8, 8)),
    (1 << 62, (32, 16)),
)


def ntt_radix_for(n: int):
    """Stage-walker radix for a degree-n body: the HEXL_TPU_NTT_RADIX
    override when set, else the measured per-size TPU default, else
    (2, 2) (non-TPU backends: fusion is bit-identical but only bloats
    compile time; n < 2^13: fusion is neutral)."""
    from .. import config as _config
    r = _config.ntt_radix()
    if r is not None:
        return r
    if n < (1 << 13) or _config.default_backend() != "tpu":
        return (2, 2)
    for thresh, rad in _TPU_NTT_RADIX_DEFAULTS:
        if n <= thresh:
            return rad
    return (32, 16)  # pragma: no cover


def fwd_body_2d(x: U64, q: U64, two_q: U64, fwd_a, fwd_b, rows: int,
                tiles: int, lane_l: int, radix,
                lean_ok: bool = False, lean16_ok: bool = False) -> U64:
    """Table-parameterized 2D forward body: q/two_q and the stage tables
    are operands (traced under vmap for the stacked multi-modulus path,
    ntt/rns.py), everything else static. `radix` is the per-phase stage
    fusion factor (int or (phase_a, phase_b) pair of powers of two): the
    generic walker fuses log2(radix) butterfly stages per HBM
    materialization — the XLA path is stage-round-trip bound, so this
    divides phase traffic by the fusion factor."""
    radix_a, radix_b = _norm_radix(radix)
    shape = x.lo.shape
    x = U64(x.hi.reshape(shape[:-1] + (rows, LANES)),
            x.lo.reshape(shape[:-1] + (rows, LANES)))
    row_axis = x.lo.ndim - 2
    fwd_bfly, _, scheme = _bflys3(lean_ok, lean16_ok)
    # Phase A: strides >= 128 pair row blocks.
    stages_a = list(fwd_a)
    i = 0
    while i < len(stages_a):
        log_k = min(radix_a.bit_length() - 1, len(stages_a) - i)
        m, t, w, wp = stages_a[i]
        if log_k <= 1:
            xs, ys, join = _split2(x, row_axis, m, t // LANES)
            nx, ny = fwd_bfly(xs, ys, _bcast_w(w, 0, "a"),
                              _bcast_w(wp, 0, "a"), q, two_q)
            x = join(nx, ny)
            i += 1
            continue
        k = 1 << log_k
        es, join = _splitk(x, row_axis, m, k,
                           (t // LANES) >> (log_k - 1))
        wparts = [_parts_a(stages_a[i + j][2], m, 1 << j)
                  for j in range(log_k)]
        wpparts = [_parts_a(stages_a[i + j][3], m, 1 << j)
                   for j in range(log_k)]
        x = join(*_fwd_radixk_step(es, wparts, wpparts, q, two_q,
                                   fwd_bfly))
        i += log_k
    # Phase B: transpose tiles, strides 64..1 pair sublane blocks.
    # For lane_l < 128 the transposed minor dim under-fills the lane
    # tile; pack kb = 128/lane_l polys side by side instead
    # (config.ntt_pack) — same materialization count, full tiles.
    kb = _pack_kb_ntt(x, tiles, lane_l)
    if kb > 1:
        x = _pack_b(x, kb, lane_l)
        stages_b = _tile_stages_b(list(fwd_b), kb)
    else:
        x = _transpose_tiles(x, tiles, lane_l)
        stages_b = list(fwd_b)
    c_axis = x.lo.ndim - 2
    i = 0
    while i < len(stages_b):
        m, t, w, wp = stages_b[i]
        nb = LANES // (2 * t)
        log_k = min(radix_b.bit_length() - 1, len(stages_b) - i)
        if log_k <= 1:
            xs, ys, join = _split2(x, c_axis, nb, t)
            nx, ny = fwd_bfly(xs, ys, _bcast_w(w, 0, "b"),
                              _bcast_w(wp, 0, "b"), q, two_q)
            x = join(nx, ny)
            i += 1
            continue
        k = 1 << log_k
        es, join = _splitk(x, c_axis, nb, k, t >> (log_k - 1))
        wparts = [_parts_b(stages_b[i + j][2], nb, 1 << j)
                  for j in range(log_k)]
        wpparts = [_parts_b(stages_b[i + j][3], nb, 1 << j)
                   for j in range(log_k)]
        x = join(*_fwd_radixk_step(es, wparts, wpparts, q, two_q,
                                   fwd_bfly))
        i += log_k
    if kb > 1:
        x = _unpack_b(x, kb, lane_l)
    else:
        x = _untranspose_tiles(x, rows)
    x = _fwd_fixup(x, scheme, two_q)
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
        out = cond_sub64_half(out, q)  # out < 2q
    return out


def _final_inv_stage_fin(xs: U64, ys: U64, fin, q: U64,
                         two_q: U64) -> tuple:
    """Last butterfly stage fused with x N^{-1}; `fin` is the traced
    4-tuple (inv_n, inv_n_precon, inv_n_w, inv_n_w_precon) as U64s."""
    inv_n, inv_n_precon, inv_n_w, inv_n_w_precon = fin
    tx = cond_sub64_half(add64(xs, ys), two_q)
    ty = sub64(add64(xs, two_q), ys)
    nx = _shoup(tx, inv_n, inv_n_precon, q)
    ny = _shoup(ty, inv_n_w, inv_n_w_precon, q)
    return nx, ny


def _final_inv_stage_lean4(xs: U64, ys: U64, fin, q: U64,
                           two_q: U64) -> tuple:
    """Final N^{-1}-fused stage for the lean4 invariant (inputs [0,4q)).

    Exact Shoup multiplies land in [0,2q) for ANY 64-bit input, so the
    sums need no range control at all; only ty's additive constant must
    cover the widened ys range (4q instead of 2q)."""
    inv_n, inv_n_precon, inv_n_w, inv_n_w_precon = fin
    four_q = add64(two_q, two_q)
    tx = add64(xs, ys)                      # < 8q; Shoup takes any u64
    ty = sub64(add64(xs, four_q), ys)
    nx = _shoup(tx, inv_n, inv_n_precon, q)
    ny = _shoup(ty, inv_n_w, inv_n_w_precon, q)
    return nx, ny


def _final_inv_stage_lean8(xs: U64, ys: U64, fin, q: U64,
                           two_q: U64) -> tuple:
    """Final N^{-1}-fused stage for the lean8 inverse invariant (inputs
    [0,8q), q < 2^60 so the 16q intermediate fits u64). Exact Shoup
    multiplies accept any u64, so no range control is needed; outputs
    land in the contract range [0,2q)."""
    inv_n, inv_n_precon, inv_n_w, inv_n_w_precon = fin
    four_q = add64(two_q, two_q)
    eight_q = add64(four_q, four_q)
    tx = add64(xs, ys)                      # < 16q; Shoup takes any u64
    ty = sub64(add64(xs, eight_q), ys)      # (0,16q)
    nx = _shoup(tx, inv_n, inv_n_precon, q)
    ny = _shoup(ty, inv_n_w, inv_n_w_precon, q)
    return nx, ny


_FIN_STAGES = {"lean16": _final_inv_stage_lean8,
               "lean8": _final_inv_stage_lean4}


def _fin_stage_for(scheme: str):
    """Final-stage variant matching the inverse body's internal
    invariant ([0,8q) under lean16, [0,4q) under lean8, [0,2q) exact)."""
    return _FIN_STAGES.get(scheme, _final_inv_stage_fin)


def _plan_fin(plan: NttPlan):
    return (const64(plan.inv_n), const64(plan.inv_n_precon),
            const64(plan.inv_n_w), const64(plan.inv_n_w_precon))


def _final_inv_stage(xs: U64, ys: U64, plan: NttPlan, q: U64,
                     two_q: U64) -> tuple:
    """Last butterfly stage fused with multiplication by N^{-1}."""
    return _final_inv_stage_fin(xs, ys, _plan_fin(plan), q, two_q)


def _inv_small(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    lean_ok, lean16_ok = scheme_gates(plan.q, plan.n)
    return inv_body_small(x, q, two_q, plan.n, plan.irop_dev,
                          plan.pirop_dev, _plan_fin(plan),
                          lean_ok=lean_ok, lean16_ok=lean16_ok)


def inv_body_small(x: U64, q: U64, two_q: U64, n: int, irop_dev: U64,
                   pirop_dev: U64, fin, lean_ok: bool = False,
                   lean16_ok: bool = False) -> U64:
    _, inv_bfly, scheme = _bflys3(lean_ok, lean16_ok)
    fin_stage = _fin_stage_for(scheme)
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
    nx, ny = fin_stage(xs, ys, fin, q, two_q)
    return join(nx, ny)


def _inv_2d(x: U64, plan: NttPlan, q: U64, two_q: U64) -> U64:
    radix = ntt_radix_for(plan.n)
    lean_ok, lean16_ok = scheme_gates(plan.q, plan.n)
    return inv_body_2d(x, q, two_q, plan.inv_b, plan.inv_a, _plan_fin(plan),
                       plan.rows, plan.tiles, plan.lane_l, radix,
                       lean_ok=lean_ok, lean16_ok=lean16_ok)


def inv_body_2d(x: U64, q: U64, two_q: U64, inv_b, inv_a, fin, rows: int,
                tiles: int, lane_l: int, radix,
                lean_ok: bool = False, lean16_ok: bool = False) -> U64:
    """Table-parameterized 2D inverse body (see fwd_body_2d)."""
    radix_a, radix_b = _norm_radix(radix)
    shape = x.lo.shape
    x = U64(x.hi.reshape(shape[:-1] + (rows, LANES)),
            x.lo.reshape(shape[:-1] + (rows, LANES)))
    _, inv_bfly, scheme = _bflys3(lean_ok, lean16_ok)
    fin_stage = _fin_stage_for(scheme)
    # Phase B first (strides 1..64) in the transposed layout; packed
    # into full lane tiles when lane_l < 128 (see fwd_body_2d).
    kb = _pack_kb_ntt(x, tiles, lane_l)
    if kb > 1:
        x = _pack_b(x, kb, lane_l)
        stages_b = _tile_stages_b(list(inv_b), kb)
    else:
        x = _transpose_tiles(x, tiles, lane_l)
        stages_b = list(inv_b)
    c_axis = x.lo.ndim - 2
    i = 0
    while i < len(stages_b):
        m, t, w, wp = stages_b[i]
        nb = LANES // (2 * t)
        log_k = min(radix_b.bit_length() - 1, len(stages_b) - i)
        if log_k <= 1:
            xs, ys, join = _split2(x, c_axis, nb, t)
            nx, ny = inv_bfly(xs, ys, _bcast_w(w, 0, "b"),
                              _bcast_w(wp, 0, "b"), q, two_q)
            x = join(nx, ny)
            i += 1
            continue
        k = 1 << log_k
        es, join = _splitk(x, c_axis, nb >> (log_k - 1), k, t)
        wparts = [_parts_b(stages_b[i + j][2], nb >> (log_k - 1),
                           k >> (j + 1)) for j in range(log_k)]
        wpparts = [_parts_b(stages_b[i + j][3], nb >> (log_k - 1),
                            k >> (j + 1)) for j in range(log_k)]
        x = join(*_inv_radixk_step(es, wparts, wpparts, q, two_q,
                                   inv_bfly))
        i += log_k
    if kb > 1:
        x = _unpack_b(x, kb, lane_l)
    else:
        x = _untranspose_tiles(x, rows)
    # Phase A (strides 128 .. N/4) on row blocks.
    row_axis = x.lo.ndim - 2
    stages_a = list(inv_a)
    i = 0
    while i < len(stages_a):
        m, t, w, wp = stages_a[i]
        log_k = min(radix_a.bit_length() - 1, len(stages_a) - i)
        if log_k <= 1:
            xs, ys, join = _split2(x, row_axis, m, t // LANES)
            nx, ny = inv_bfly(xs, ys, _bcast_w(w, 0, "a"),
                              _bcast_w(wp, 0, "a"), q, two_q)
            x = join(nx, ny)
            i += 1
            continue
        k = 1 << log_k
        es, join = _splitk(x, row_axis, m >> (log_k - 1), k,
                           t // LANES)
        wparts = [_parts_a(stages_a[i + j][2], m >> (log_k - 1),
                           k >> (j + 1)) for j in range(log_k)]
        wpparts = [_parts_a(stages_a[i + j][3], m >> (log_k - 1),
                            k >> (j + 1)) for j in range(log_k)]
        x = join(*_inv_radixk_step(es, wparts, wpparts, q, two_q,
                                   inv_bfly))
        i += log_k
    # Final fused stage pairs row r with row r + R/2.
    half = rows // 2
    sl = [slice(None)] * x.lo.ndim
    sl_x, sl_y = list(sl), list(sl)
    sl_x[row_axis] = slice(0, half)
    sl_y[row_axis] = slice(half, rows)
    xs = U64(x.hi[tuple(sl_x)], x.lo[tuple(sl_x)])
    ys = U64(x.hi[tuple(sl_y)], x.lo[tuple(sl_y)])
    nx, ny = fin_stage(xs, ys, fin, q, two_q)
    hi = jnp.concatenate([nx.hi, ny.hi], axis=row_axis)
    lo = jnp.concatenate([nx.lo, ny.lo], axis=row_axis)
    return U64(hi.reshape(shape), lo.reshape(shape))
