"""FFT-like transform for CKKS encode/decode (complex roots of X^N + 1).

Radix-2 complex transform over the 2N-th complex roots of unity with
bit-reversed twiddle tables and the same scale-fusing behavior as the
reference (hexl/experimental/fft-like/fft-like.cpp:36-134,
fft-like-native.cpp): with a scalar, the forward output is (1/scalar) x
FFT, the inverse is (scalar/N) x unnormalized inverse, so the pair
round-trips.

Precision note: tables are built in float64 on the host; the transform runs
in complex128 where x64 is available and in double-float (2x f32 planes,
~48 mantissa bits — hexl_tpu.experimental.df32) on TPU, which has no
native f64 vector datapath. The reference's tolerance-based CheckClose
testing model applies (test-fft-like.cpp). precision="single" selects the
fast complex64 path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config, nt


def _build_tables(n: int):
    """Bit-reversed complex root tables (matches the reference layout)."""
    bits = nt.log2_exact(n)
    k = np.arange(2 * n)
    roots = np.exp(2j * np.pi * k / (2 * n))
    rev = np.array([nt.reverse_bits(i, bits) for i in range(n)])
    fwd = np.zeros(n, dtype=np.complex128)
    fwd[1:] = roots[rev[1:]]
    inv = np.zeros(n, dtype=np.complex128)
    inv[1:] = np.conj(roots[(rev[np.arange(1, n) - 1] + 1)])
    return fwd, inv


def _stage_loop_fwd(x, table, n, scalar):
    m = 1
    gap = n >> 1
    while m < n:
        v = x.reshape(x.shape[:-1] + (m, 2, gap))
        xs = v[..., 0, :]
        ys = v[..., 1, :]
        w = table[m:2 * m][:, None]
        if gap == 1 and scalar is not None:
            w = w * scalar
            xs = xs * scalar
        t = ys * w
        x = jnp.stack([xs + t, xs - t], axis=-2).reshape(x.shape)
        m <<= 1
        gap >>= 1
    return x


# ---------------------------------------------------------------------------
# Single-precision lane as split re/im f32 planes. complex64 CONSTANTS fail
# to lower on this TPU backend (measured round 2), so precision="single" on
# TPU carries complex values as a (re, im) float32 pytree and does the
# complex arithmetic manually — same butterflies, same stage order as the
# complex64 loops (reference: fft-like.cpp:74-134; its AVX512 kernels also
# operate on split interleaved doubles, fwd-fft-like-avx512.cpp).
# ---------------------------------------------------------------------------

class CS(NamedTuple):
    """A complex64 array as two float32 planes."""

    re: jnp.ndarray
    im: jnp.ndarray


def cs_from_complex(x) -> CS:
    a = np.asarray(x, dtype=np.complex64)
    return CS(jnp.asarray(a.real.astype(np.float32)),
              jnp.asarray(a.imag.astype(np.float32)))


def cs_to_complex64(x: CS) -> np.ndarray:
    return (np.asarray(x.re).astype(np.complex64)
            + 1j * np.asarray(x.im).astype(np.complex64))


def _cs_mul(a: CS, b: CS) -> CS:
    return CS(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def _cs_scale(a: CS, s) -> CS:
    s = jnp.float32(s)
    return CS(a.re * s, a.im * s)


def _cs_map(f, *xs):
    return CS(f(*[x.re for x in xs]), f(*[x.im for x in xs]))


def _stage_loop_fwd_cs(x: CS, table: CS, n, scalar) -> CS:
    """Split-plane mirror of _stage_loop_fwd (same butterfly order)."""
    m = 1
    gap = n >> 1
    shape = x.re.shape
    while m < n:
        v = _cs_map(lambda p: p.reshape(p.shape[:-1] + (m, 2, gap)), x)
        xs = _cs_map(lambda p: p[..., 0, :], v)
        ys = _cs_map(lambda p: p[..., 1, :], v)
        w = _cs_map(lambda p: p[m:2 * m][:, None], table)
        if gap == 1 and scalar is not None:
            w = _cs_scale(w, scalar)
            xs = _cs_scale(xs, scalar)
        t = _cs_mul(ys, w)
        x = _cs_map(
            lambda a, b: jnp.stack([a, b], axis=-2).reshape(shape),
            _cs_map(jnp.add, xs, t), _cs_map(jnp.subtract, xs, t))
        m <<= 1
        gap >>= 1
    return x


def _stage_loop_inv_cs(x: CS, table: CS, n, scalar) -> CS:
    """Split-plane mirror of _stage_loop_inv."""
    root_index = 1
    gap = 1
    m = n >> 1
    stop = 0 if scalar is None else 1
    shape = x.re.shape
    while m > stop:
        v = _cs_map(lambda p: p.reshape(p.shape[:-1] + (m, 2, gap)), x)
        xs = _cs_map(lambda p: p[..., 0, :], v)
        ys = _cs_map(lambda p: p[..., 1, :], v)
        w = _cs_map(lambda p, r=root_index, mm=m: p[r:r + mm][:, None],
                    table)
        root_index += m
        lo = _cs_map(jnp.add, xs, ys)
        hi = _cs_mul(_cs_map(jnp.subtract, xs, ys), w)
        x = _cs_map(
            lambda a, b: jnp.stack([a, b], axis=-2).reshape(shape),
            lo, hi)
        m >>= 1
        gap <<= 1
    if stop == 1:
        half = n >> 1
        xs = _cs_map(lambda p: p[..., :half], x)
        ys = _cs_map(lambda p: p[..., half:], x)
        w = _cs_scale(_cs_map(lambda p: p[root_index], table), scalar)
        lo = _cs_scale(_cs_map(jnp.add, xs, ys), scalar)
        hi = _cs_mul(_cs_map(jnp.subtract, xs, ys), w)
        x = _cs_map(lambda a, b: jnp.concatenate([a, b], axis=-1), lo, hi)
    return x


def _stage_loop_inv(x, table, n, scalar):
    root_index = 1
    gap = 1
    m = n >> 1
    stop = 0 if scalar is None else 1
    while m > stop:
        v = x.reshape(x.shape[:-1] + (m, 2, gap))
        xs = v[..., 0, :]
        ys = v[..., 1, :]
        w = table[root_index:root_index + m][:, None]
        root_index += m
        x = jnp.stack([xs + ys, (xs - ys) * w], axis=-2).reshape(x.shape)
        m >>= 1
        gap <<= 1
    if stop == 1:
        half = n >> 1
        xs = x[..., :half]
        ys = x[..., half:]
        w = table[root_index] * scalar
        x = jnp.concatenate([(xs + ys) * scalar, (xs - ys) * w], axis=-1)
    return x


# ---------------------------------------------------------------------------
# 2D staged path (n >= MIN_2D_N) — the NTT bodies' phase-A/phase-B layout
# (ntt/jnp_ntt.py) applied to the complex double-float transform. The flat
# (m, 2, gap) walk below relayouts all four f32 planes at lane granularity
# every stage; the 2D walk keeps stage slices on the row/sublane axes
# (cheap concats), with one tile transpose per direction. Butterfly order
# and arithmetic are identical, so results match the flat loops bit-for-bit.
# ---------------------------------------------------------------------------

def _tmap(f, *xs):
    return jax.tree.map(f, *xs)


def _t_split2(x, axis: int, m: int, t: int):
    """Pytree-generic jnp_ntt._split2: slice one axis of size m*2t into
    X/Y halves plus a concat-based reassembly closure."""
    def rs(p):
        s = p.shape
        return p.reshape(s[:axis] + (m, 2 * t) + s[axis + 1:])
    v = _tmap(rs, x)
    ndim = v.re.hi.ndim
    sl_x = [slice(None)] * ndim
    sl_y = [slice(None)] * ndim
    sl_x[axis + 1] = slice(0, t)
    sl_y[axis + 1] = slice(t, 2 * t)
    xs = _tmap(lambda p: p[tuple(sl_x)], v)
    ys = _tmap(lambda p: p[tuple(sl_y)], v)

    def join(nx, ny):
        def cat(a, b):
            h = jnp.concatenate([a, b], axis=axis + 1)
            s = h.shape
            return h.reshape(s[:axis] + (m * 2 * t,) + s[axis + 2:])
        return _tmap(cat, nx, ny)

    return xs, ys, join


def _t_transpose_tiles(x, tiles: int, lane_l: int):
    """(..., R, 128) -> (..., tiles, 128, L) rows<->lanes tile transpose."""
    def t(p):
        s = p.shape[:-2] + (tiles, lane_l, 128)
        return p.reshape(s).swapaxes(-1, -2)
    return _tmap(t, x)


def _t_untranspose_tiles(x, rows: int):
    def t(p):
        v = p.swapaxes(-1, -2)
        return v.reshape(v.shape[:-3] + (rows, 128))
    return _tmap(t, x)


def _bfly_fwd_df(xs, ys, w):
    """X' = xs + ys*w, Y' = xs - ys*w (w presplit inside, per table slice)."""
    from . import df32 as D
    t = D.cdf_mul_ps(ys, D.cdf_presplit(w))
    return D.cdf_add(xs, t), D.cdf_sub(xs, t)


def _bfly_inv_df(xs, ys, w):
    """X' = xs + ys, Y' = (xs - ys)*w."""
    from . import df32 as D
    return D.cdf_add(xs, ys), D.cdf_mul_ps(D.cdf_sub(xs, ys),
                                           D.cdf_presplit(w))


def _t_splitk(x, axis: int, m: int, k: int, part: int):
    """Pytree-generic jnp_ntt._splitk: one axis of size m*k*part -> the
    k part sub-arrays + a concat reassembly. One materialization per
    log2(k) butterfly stages — the DF planes pay 4x the NTT's relayout
    cost per stage (re/im x hi/lo) and the small-N FFT is HBM-bound
    (benchmarks/fft_profile.py), so stage fusion pays doubly here."""
    def rs(p):
        s = p.shape
        return p.reshape(s[:axis] + (m, k * part) + s[axis + 1:])
    v = _tmap(rs, x)
    ndim = v.re.hi.ndim
    es = []
    for j in range(k):
        sl = [slice(None)] * ndim
        sl[axis + 1] = slice(j * part, (j + 1) * part)
        es.append(_tmap(lambda p, sl=tuple(sl): p[sl], v))

    def join(*outs):
        def cat(*ps):
            h = jnp.concatenate(ps, axis=axis + 1)
            s = h.shape
            return h.reshape(s[:axis] + (m * k * part,) + s[axis + 2:])
        return _tmap(cat, *outs)

    return es, join


def _sq1(p):
    """Single-element broadcast table -> 0-d scalar extract. Mosaic
    cannot lower a (1,..,1) vector broadcast into both sublanes and
    lanes ("Broadcast in both sublanes and lanes: not implemented");
    a scalar splat lowers everywhere, and XLA broadcasts a 0-d value
    identically to a (1,..,1) one — results are bit-equal."""
    return p[(0,) * p.ndim] if p.size == 1 else p


def _bcast_a_df(w):
    """Phase-A stage table (m,) -> (m, 1, 1) (scalar extract at m=1).
    Tables already densified to the full (m, t/128, 128) stage shape
    (the Pallas kernel's form — Mosaic cannot broadcast into sublanes
    and lanes at once) pass through unchanged."""
    return _tmap(
        lambda p: _sq1(p[:, None, None]) if p.ndim == 1 else p, w)


def _t_parts_a(w, m: int, parts: int):
    """Phase-A stage table (m*parts,) -> `parts` interleaved (m, 1, 1)
    slices (jnp_ntt._parts_a; part g holds the twiddles the g-th
    butterfly group of a fused level consumes)."""
    if parts == 1:
        return [_bcast_a_df(w)]
    return [_tmap(lambda p, j=j:
                  _sq1(p.reshape(m, parts)[:, j][:, None, None]), w)
            for j in range(parts)]


def _t_parts_b(w, nb: int, parts: int):
    """Phase-B stage table (tiles, nb*parts, L) -> `parts` interleaved
    (tiles, nb, 1, L) slices (jnp_ntt._parts_b)."""
    if parts == 1:
        return [_tmap(lambda p: p[:, :, None, :], w)]
    return [_tmap(lambda p, j=j:
                  p.reshape(p.shape[0], nb, parts, p.shape[2])
                  [:, :, j][:, :, None, :], w)
            for j in range(parts)]


def _fwd_radixk_df(es, wparts):
    """log2(len(es)) forward DF levels fused over a block list
    (descending strides) — jnp_ntt._fwd_radixk_step with the complex
    double-float butterfly. Bit-exact equal to the sequential stages
    (same ops in the same order)."""
    e = list(es)
    k = len(e)
    log_k = k.bit_length() - 1
    for j in range(log_k):
        half = k >> (j + 1)
        for base in range(0, k, 2 * half):
            g = base >> (log_k - j)
            for i in range(base, base + half):
                e[i], e[i + half] = _bfly_fwd_df(e[i], e[i + half],
                                                 wparts[j][g])
    return e


def _inv_radixk_df(es, wparts):
    """Mirror of _fwd_radixk_df: inverse DF levels fused, ascending
    strides (jnp_ntt._inv_radixk_step)."""
    e = list(es)
    k = len(e)
    for j in range(k.bit_length() - 1):
        half = 1 << j
        for base in range(0, k, 2 * half):
            g = base >> (j + 1)
            for i in range(base, base + half):
                e[i], e[i + half] = _bfly_inv_df(e[i], e[i + half],
                                                 wparts[j][g])
    return e


# Measured per-direction defaults for the TPU backend (v5e, batch 32,
# chain-differential protocol, packed phase B, 2026-08-20 radix sweeps
# — see benchmarks/fft_profile.py and docs/ROADMAP.md). Key: size
# threshold (use the first row with n <= thresh); values: (fwd
# (ra, rb), inv (ra, rb)). The optimum differs per direction and size
# class because phase A/B stage counts and the register pressure of
# the fused groups differ; every combo is bit-identical, so this is
# purely a scheduling choice. Measured at 4096: inv 4.15 us (radix-2,
# unpacked) -> 1.64 us ((4,8) packed); fwd 3.77 -> 1.51.
_TPU_RADIX_DEFAULTS = (
    (2048, ((4, 4), (8, 8))),
    (4096, ((4, 8), (4, 8))),
    (1 << 30, ((8, 8), (8, 8))),
)


def _fft_radix(n: int, forward: bool = True) -> tuple:
    """Per-phase stage-fusion factors (radix_a, radix_b) for the DF
    walkers. HEXL_TPU_FFT_RADIX overrides both directions; unset, the
    measured per-direction table above applies on TPU and (2, 2)
    elsewhere (fusion corrupts the Dekker planes under XLA-CPU jit).
    Below MIN_2D_N the flat loop runs radix-2 regardless."""
    from ..ntt.plan import MIN_2D_N
    if n < MIN_2D_N:
        return (2, 2)
    r = config.fft_radix()
    if r is not None:
        return r if isinstance(r, tuple) else (int(r), int(r))
    if config.default_backend() != "tpu":
        return (2, 2)
    for thresh, (fwd_r, inv_r) in _TPU_RADIX_DEFAULTS:
        if n <= thresh:
            return fwd_r if forward else inv_r
    return (8, 8)  # pragma: no cover



def _t_pack_b(x, kb: int, lane_l: int):
    """(B, rows, 128) -> (B/kb, 1, 128, kb*L): the tile transpose with
    kb polynomials packed side by side into the lane axis. For
    lane_l < 128 the plain transposed layout wastes (128-lane_l)/128 of
    every vector op and HBM tile on padding (config.fft_pack); packing
    restores full tiles at the SAME materialization count (this replaces
    _t_transpose_tiles, it does not follow it). Pure lane permutation:
    packed[b, 0, c, j*L + l] == transposed[b*kb + j, 0, c, l]."""
    def t(p):
        b = p.shape[0] // kb
        v = p.reshape(b, kb, lane_l, 128)
        return v.transpose(0, 3, 1, 2).reshape(b, 1, 128, kb * lane_l)
    return _tmap(t, x)


def _t_unpack_b(x, kb: int, lane_l: int):
    """Inverse of _t_pack_b: (B/kb, 1, 128, kb*L) -> (B, rows, 128)."""
    def t(p):
        b = p.shape[0]
        v = p.reshape(b, 128, kb, lane_l).transpose(0, 2, 3, 1)
        return v.reshape(b * kb, lane_l, 128)
    return _tmap(t, x)


def _t_tile_stages_b(stages, kb: int):
    """Tile phase-B stage tables (1, nb, L) -> (1, nb, kb*L) for the
    packed walk (packed lane j*L + l carries poly j's element l, which
    consumes the same twiddle as the unpacked element l)."""
    return [(m, t, _tmap(lambda p: jnp.tile(p, (1, 1, kb)), w), None)
            for m, t, w, _ in stages]


def _pack_kb(x, tiles: int, lane_l: int):
    """Packing factor for the phase-B walk, or 1 when inapplicable
    (multi-tile layouts, batch not divisible, packing disabled)."""
    if tiles != 1 or lane_l >= 128 or not config.fft_pack():
        return 1
    lead = x.re.hi.shape[:-2]
    if len(lead) != 1:  # walkers flatten batch to one axis before this
        return 1
    kb = 128 // lane_l
    return kb if lead[0] % kb == 0 else 1


def _fwd_2d_df(x, st, n, rows, tiles, lane_l, scalar, radix=None):
    """Forward staged transform; `st` is (fwd_a, fwd_b) stage lists.
    `radix` is the per-phase stage-fusion factor (int or (ra, rb) pair
    of powers of two, default config.fft_radix): the generic walker
    fuses log2(radix) butterfly stages per HBM materialization —
    jnp_ntt.fwd_body_2d applied to the complex double-float planes."""
    from . import df32 as D
    radix_a, radix_b = _fft_radix(n, forward=True) if radix is None \
        else ((radix, radix) if isinstance(radix, int) else radix)
    shape = x.re.hi.shape
    x = _tmap(lambda p: p.reshape(shape[:-1] + (rows, 128)), x)
    row_axis = x.re.hi.ndim - 2
    stages_a = list(st[0])
    i = 0
    while i < len(stages_a):
        m, t, w, _ = stages_a[i]
        log_k = min(radix_a.bit_length() - 1, len(stages_a) - i)
        if log_k <= 1:
            xs, ys, join = _t_split2(x, row_axis, m, t // 128)
            x = join(*_bfly_fwd_df(xs, ys, _bcast_a_df(w)))
            i += 1
            continue
        k = 1 << log_k
        es, join = _t_splitk(x, row_axis, m, k,
                             (t // 128) >> (log_k - 1))
        wparts = [_t_parts_a(stages_a[i + j][2], m, 1 << j)
                  for j in range(log_k)]
        x = join(*_fwd_radixk_df(es, wparts))
        i += log_k
    kb = _pack_kb(x, tiles, lane_l)
    if kb > 1:
        x = _t_pack_b(x, kb, lane_l)
        stages_b = _t_tile_stages_b(list(st[1]), kb)
    else:
        x = _t_transpose_tiles(x, tiles, lane_l)
        stages_b = list(st[1])
    c_axis = x.re.hi.ndim - 2
    i = 0
    while i < len(stages_b):
        m, t, w, _ = stages_b[i]
        nb = 128 // (2 * t)
        log_k = min(radix_b.bit_length() - 1, len(stages_b) - i)
        if log_k <= 1:
            xs, ys, join = _t_split2(x, c_axis, nb, t)
            x = join(*_bfly_fwd_df(xs, ys,
                                   _tmap(lambda p: p[:, :, None, :], w)))
            i += 1
            continue
        k = 1 << log_k
        es, join = _t_splitk(x, c_axis, nb, k, t >> (log_k - 1))
        wparts = [_t_parts_b(stages_b[i + j][2], nb, 1 << j)
                  for j in range(log_k)]
        x = join(*_fwd_radixk_df(es, wparts))
        i += log_k
    if kb > 1:
        x = _t_unpack_b(x, kb, lane_l)
    else:
        x = _t_untranspose_tiles(x, rows)
    x = _tmap(lambda p: p.reshape(shape), x)
    if scalar is not None:
        # Last-stage scale fusion (reference fft-like-native.cpp) scales
        # both butterfly terms, i.e. the whole final output, by `scalar`.
        x = D.cdf_scale(x, scalar)
    return x


def _inv_2d_df(x, st, n, rows, tiles, lane_l, w_final, scalar,
               radix=None):
    """Inverse staged transform; `st` is (inv_b, inv_a); w_final is the
    CDF scalar twiddle of the last (t = n/2) stage, which build_stage_lists
    leaves to the caller (NTT fuses N^-1 there; the FFT fuses `scalar`).
    `radix` as in _fwd_2d_df (jnp_ntt.inv_body_2d's walk)."""
    from . import df32 as D
    radix_a, radix_b = _fft_radix(n, forward=False) if radix is None \
        else ((radix, radix) if isinstance(radix, int) else radix)
    shape = x.re.hi.shape
    x = _tmap(lambda p: p.reshape(shape[:-1] + (rows, 128)), x)
    kb = _pack_kb(x, tiles, lane_l)
    if kb > 1:
        x = _t_pack_b(x, kb, lane_l)
        stages_b = _t_tile_stages_b(list(st[0]), kb)
    else:
        x = _t_transpose_tiles(x, tiles, lane_l)
        stages_b = list(st[0])
    c_axis = x.re.hi.ndim - 2
    i = 0
    while i < len(stages_b):
        m, t, w, _ = stages_b[i]
        nb = 128 // (2 * t)
        log_k = min(radix_b.bit_length() - 1, len(stages_b) - i)
        if log_k <= 1:
            xs, ys, join = _t_split2(x, c_axis, nb, t)
            x = join(*_bfly_inv_df(xs, ys,
                                   _tmap(lambda p: p[:, :, None, :], w)))
            i += 1
            continue
        k = 1 << log_k
        es, join = _t_splitk(x, c_axis, nb >> (log_k - 1), k, t)
        wparts = [_t_parts_b(stages_b[i + j][2], nb >> (log_k - 1),
                             k >> (j + 1)) for j in range(log_k)]
        x = join(*_inv_radixk_df(es, wparts))
        i += log_k
    if kb > 1:
        x = _t_unpack_b(x, kb, lane_l)
    else:
        x = _t_untranspose_tiles(x, rows)
    row_axis = x.re.hi.ndim - 2
    stages_a = list(st[1])
    i = 0
    while i < len(stages_a):
        m, t, w, _ = stages_a[i]
        log_k = min(radix_a.bit_length() - 1, len(stages_a) - i)
        if log_k <= 1:
            xs, ys, join = _t_split2(x, row_axis, m, t // 128)
            x = join(*_bfly_inv_df(xs, ys, _bcast_a_df(w)))
            i += 1
            continue
        k = 1 << log_k
        es, join = _t_splitk(x, row_axis, m >> (log_k - 1), k,
                             t // 128)
        wparts = [_t_parts_a(stages_a[i + j][2], m >> (log_k - 1),
                             k >> (j + 1)) for j in range(log_k)]
        x = join(*_inv_radixk_df(es, wparts))
        i += log_k
    # Final stage pairs row r with row r + rows/2; fuse `scalar` if given.
    xs, ys, join = _t_split2(x, row_axis, 1, rows // 2)
    tx = D.cdf_add(xs, ys)
    ty = D.cdf_sub(xs, ys)
    if scalar is not None:
        tx = D.cdf_scale(tx, scalar)
        w_final = D.cdf_scale(w_final, scalar)
    ny = D.cdf_mul_ps(ty, D.cdf_presplit(w_final))
    x = join(tx, ny)
    return _tmap(lambda p: p.reshape(shape), x)


def _df_reshape(x, shape):
    from .df32 import CDF, DF
    return CDF(DF(x.re.hi.reshape(shape), x.re.lo.reshape(shape)),
               DF(x.im.hi.reshape(shape), x.im.lo.reshape(shape)))


def _df_index(x, idx):
    from .df32 import CDF, DF
    return CDF(DF(x.re.hi[idx], x.re.lo[idx]),
               DF(x.im.hi[idx], x.im.lo[idx]))


def _df_concat(parts, axis):
    from .df32 import CDF, DF

    def cat(sel):
        return jnp.concatenate([sel(p) for p in parts], axis=axis)

    return CDF(DF(cat(lambda p: p.re.hi), cat(lambda p: p.re.lo)),
               DF(cat(lambda p: p.im.hi), cat(lambda p: p.im.lo)))


def _stage_loop_fwd_df(x, table, n, scalar):
    """Forward stages on complex double-float planes (TPU f64 surrogate)."""
    from . import df32 as D
    m = 1
    gap = n >> 1
    while m < n:
        shp = x.re.hi.shape
        v = _df_reshape(x, shp[:-1] + (m, 2, gap))
        xs = _df_index(v, (Ellipsis, slice(None), 0, slice(None)))
        ys = _df_index(v, (Ellipsis, slice(None), 1, slice(None)))
        w = _df_index(table, (slice(m, 2 * m), None))
        if gap == 1 and scalar is not None:
            w = D.cdf_scale(w, scalar)
            xs = D.cdf_scale(xs, scalar)
        # Presplitting the (m, 1) twiddle slice is ~free next to the
        # (batch, m, gap) butterfly products that consume it.
        t = D.cdf_mul_ps(ys, D.cdf_presplit(w))
        hi = _df_concat([D.cdf_add(xs, t), D.cdf_sub(xs, t)], -2)
        x = _df_reshape(_restack(hi, m, gap), shp)
        m <<= 1
        gap >>= 1
    return x


def _restack(pair_cat, m, gap):
    """(…, 2m, gap) with halves [X..., Y...] -> interleaved (m, 2, gap)."""
    from .df32 import CDF, DF

    def rs(p):
        s = p.shape
        v = p.reshape(s[:-2] + (2, m, gap))
        return jnp.swapaxes(v, -3, -2)

    return CDF(DF(rs(pair_cat.re.hi), rs(pair_cat.re.lo)),
               DF(rs(pair_cat.im.hi), rs(pair_cat.im.lo)))


def _stage_loop_inv_df(x, table, n, scalar):
    from . import df32 as D
    root_index = 1
    gap = 1
    m = n >> 1
    stop = 0 if scalar is None else 1
    while m > stop:
        shp = x.re.hi.shape
        v = _df_reshape(x, shp[:-1] + (m, 2, gap))
        xs = _df_index(v, (Ellipsis, slice(None), 0, slice(None)))
        ys = _df_index(v, (Ellipsis, slice(None), 1, slice(None)))
        w = _df_index(table, (slice(root_index, root_index + m), None))
        root_index += m
        hi = _df_concat([D.cdf_add(xs, ys),
                         D.cdf_mul_ps(D.cdf_sub(xs, ys),
                                      D.cdf_presplit(w))], -2)
        x = _df_reshape(_restack(hi, m, gap), shp)
        m >>= 1
        gap <<= 1
    if stop == 1:
        half = n >> 1
        xs = _df_index(x, (Ellipsis, slice(0, half)))
        ys = _df_index(x, (Ellipsis, slice(half, n)))
        w = D.cdf_scale(_df_index(table, (root_index,)), scalar)
        x = _df_concat([D.cdf_scale(D.cdf_add(xs, ys), scalar),
                        D.cdf_mul(D.cdf_sub(xs, ys), w)], -1)
    return x


class FFTLike:
    """Complex FFT-variant engine for degree-n vectors (n a power of 2).

    precision: "auto" (complex128 where x64 is available, double-float
    2xf32 planes on TPU), "single" (complex64), or "double_float".
    """

    def __init__(self, degree: int, scalar: float | None = None,
                 precision: str = "auto"):
        if not nt.is_power_of_two(degree):
            raise ValueError("degree must be a power of two")
        if degree <= 8:
            raise ValueError("degree should be bigger than 8")
        self.n = degree
        self._jit_memo = {}
        self.scalar = scalar
        self.scale = scalar / degree if scalar is not None else None
        self.inv_scale = 1.0 / scalar if scalar is not None else None
        fwd, inv = _build_tables(degree)
        x64 = bool(jax.config.jax_enable_x64)
        if precision not in ("auto", "single", "double_float", "f64"):
            raise ValueError(
                f"precision must be one of 'auto', 'single', "
                f"'double_float', 'f64'; got {precision!r}")
        if precision == "auto":
            if x64 and config.default_backend() != "tpu":
                precision = "f64"
            else:
                precision = "double_float"
        self.precision = precision
        if precision == "double_float":
            from .df32 import cdf_from_complex128, df_from_f64
            self.fwd_table = cdf_from_complex128(fwd)
            self.inv_table = cdf_from_complex128(inv)
            self._scale_df = (df_from_f64(np.float64(self.scale))
                              if self.scale is not None else None)
            self._inv_scale_df = (df_from_f64(np.float64(self.inv_scale))
                                  if self.inv_scale is not None else None)
            self._ctype = None
            self._st_fwd = self._st_inv = None
            from ..ntt.plan import MIN_2D_N, build_stage_lists
            if degree >= MIN_2D_N:
                rows = degree // 128
                lane_l = min(rows, 128)
                tiles = rows // lane_l
                fa, fb, ib, ia = build_stage_lists(
                    degree, fwd, fwd, inv, inv, tiles, lane_l,
                    pack=cdf_from_complex128)
                # build_stage_lists packs (w, precon) pairs; the complex
                # transform has no precondition — drop the duplicate.
                self._st_fwd = (fa, fb)
                self._st_inv = (ib, ia)
                self._rows, self._tiles, self._lane_l = rows, tiles, lane_l
                self._w_final = cdf_from_complex128(inv[degree - 1])
            return
        # precision="single" on the TPU backend: complex64 constants do
        # not lower there, so the transform runs on split re/im f32
        # planes (CS) — same butterflies, complex arithmetic done
        # manually. Elsewhere "single" stays complex64.
        self._single_planes = (precision == "single"
                               and config.default_backend() == "tpu")
        if self._single_planes:
            self._ctype = None
            self.fwd_table = cs_from_complex(fwd)
            self.inv_table = cs_from_complex(inv)
            return
        self._ctype = (jnp.complex128 if precision == "f64"
                       else jnp.complex64)
        self.fwd_table = jnp.asarray(fwd, dtype=self._ctype)
        self.inv_table = jnp.asarray(inv, dtype=self._ctype)

    def _use_pallas_fft(self) -> bool:
        from .pallas_fft import PALLAS_FFT_MAX_N
        return (self._st_fwd is not None
                and self.n <= PALLAS_FFT_MAX_N
                and config.fft_backend() == "pallas")

    def df_fwd_body(self, x, scalar=None):
        """Forward double-float body (jittable, CDF -> CDF): the fused
        Pallas kernel for layout-bound small n (config.fft_backend), the
        staged 2D walk for n >= MIN_2D_N, the flat walk below. Same
        butterflies in the same order — bit-identical for scalar=None;
        with a scalar the 2D walk scales the joined output instead of
        the last stage's two terms (equal values, last-rounding may
        differ)."""
        if self._use_pallas_fft():
            from . import pallas_fft
            return pallas_fft.fwd_fft_df(x, self, scalar)
        if self._st_fwd is not None:
            return _fwd_2d_df(x, self._st_fwd, self.n, self._rows,
                              self._tiles, self._lane_l, scalar)
        return _stage_loop_fwd_df(x, self.fwd_table, self.n, scalar)

    def df_inv_body(self, x, scalar=None):
        """Inverse double-float body (jittable, CDF -> CDF)."""
        if self._use_pallas_fft():
            from . import pallas_fft
            return pallas_fft.inv_fft_df(x, self, scalar)
        if self._st_inv is not None:
            return _inv_2d_df(x, self._st_inv, self.n, self._rows,
                              self._tiles, self._lane_l, self._w_final,
                              scalar)
        return _stage_loop_inv_df(x, self.inv_table, self.n, scalar)

    # The jitted walkers read config.fft_radix() at trace time; the
    # per-instance memo is keyed on config.trace_config() so an env
    # toggle mid-process (radix A/B) retraces instead of reusing the
    # first-traced walker.
    @property
    def _fwd_jit(self):
        key = ("fwd", config.trace_config())
        fn = self._jit_memo.get(key)
        if fn is None:
            n = self.n
            table = self.fwd_table
            if self.precision == "double_float":
                scal = self._inv_scale_df
                fn = jax.jit(lambda x: self.df_fwd_body(x, scal))
            elif self._single_planes:
                scal = self.inv_scale
                fn = jax.jit(
                    lambda x: _stage_loop_fwd_cs(x, table, n, scal))
            else:
                scal = self.inv_scale
                fn = jax.jit(lambda x: _stage_loop_fwd(x, table, n, scal))
            self._jit_memo[key] = fn
        return fn

    @property
    def _inv_jit(self):
        key = ("inv", config.trace_config())
        fn = self._jit_memo.get(key)
        if fn is None:
            n = self.n
            table = self.inv_table
            if self.precision == "double_float":
                scal = self._scale_df
                fn = jax.jit(lambda x: self.df_inv_body(x, scal))
            elif self._single_planes:
                scal = self.scale
                fn = jax.jit(
                    lambda x: _stage_loop_inv_cs(x, table, n, scal))
            else:
                scal = self.scale
                fn = jax.jit(lambda x: _stage_loop_inv(x, table, n, scal))
            self._jit_memo[key] = fn
        return fn

    def forward(self, x):
        """Forward transform to bit-reversed order; x shape (..., n)."""
        if self.precision == "double_float":
            from .df32 import cdf_from_complex128, cdf_to_complex128
            return cdf_to_complex128(self._fwd_jit(cdf_from_complex128(x)))
        if self._single_planes:
            return cs_to_complex64(self._fwd_jit(cs_from_complex(x)))
        return self._fwd_jit(jnp.asarray(x, dtype=self._ctype))

    def inverse(self, x):
        """Inverse transform from bit-reversed order; x shape (..., n)."""
        if self.precision == "double_float":
            from .df32 import cdf_from_complex128, cdf_to_complex128
            return cdf_to_complex128(self._inv_jit(cdf_from_complex128(x)))
        if self._single_planes:
            return cs_to_complex64(self._inv_jit(cs_from_complex(x)))
        return self._inv_jit(jnp.asarray(x, dtype=self._ctype))

    def build_floating_points_device(self, plain, threshold,
                                     decryption_modulus, inv_scale):
        """CRT-compose multi-word integers to scaled double-float planes
        ON DEVICE (the reference computes this as an AVX512 device kernel,
        fft-like-avx512.cpp:136-159; the TPU-native output format is the
        DF 2xf32 pair the double-float FFT consumes directly).

        plain: (mod_size, n) uint64 words (little-endian); values >=
        threshold are negative (value - decryption_modulus). Returns a
        jittable DF of shape (n,) ~= value * inv_scale with ~2^-47
        relative accuracy (the DF mantissa; the host f64 version keeps
        2^-52). Requires every |words[w] * inv_scale * 2^(64w)| within
        float32 exponent range.
        """
        from .df32 import DF, df_add, df_from_f64, df_mul
        from ..limb import U64, sub64, lt64, select64, to_limbs

        plain = np.asarray(plain, dtype=np.uint64)
        mod_size, n = plain.shape
        thr_words = [int(threshold[w]) for w in range(mod_size)]
        dec_words = [int(decryption_modulus[w]) for w in range(mod_size)]
        words = [to_limbs(plain[w]) for w in range(mod_size)]

        def body(words):
            # value >= threshold? multiword lexicographic compare, top down.
            from ..limb import const64, eq64, ge64
            ge = None
            eq_so_far = None
            for w in range(mod_size - 1, -1, -1):
                tw = const64(thr_words[w])
                gt_w = ge64(words[w], tw) & ~eq64(words[w], tw)
                eq_w = eq64(words[w], tw)
                if ge is None:
                    ge, eq_so_far = gt_w, eq_w
                else:
                    ge = ge | (eq_so_far & gt_w)
                    eq_so_far = eq_so_far & eq_w
            neg = ge | eq_so_far  # value >= threshold

            # magnitude of (value - dec) for negatives: dec - value
            # (multiword subtraction with borrow), else value itself.
            mag_pos = words
            mag_neg = []
            borrow = None
            for w in range(mod_size):
                dw = const64(dec_words[w])
                diff = sub64(dw, words[w])
                under = lt64(dw, words[w])
                if borrow is not None:
                    one = const64(1)
                    diff2 = sub64(diff, one)
                    under = under | (borrow & eq64(diff, const64(0)))
                    diff = select64(borrow, diff2, diff)
                mag_neg.append(diff)
                borrow = under
            mag = [select64(neg, mag_neg[w], mag_pos[w])
                   for w in range(mod_size)]

            # DF compose: sum_w mag[w] * (inv_scale * 2^(64w)), each u32
            # limb lifted exactly (top-24/low-8 split).
            import jax.numpy as _jnp

            def u32_df(a):
                top = (a >> 8).astype(_jnp.float32) * _jnp.float32(256.0)
                bot = (a & jnp.uint32(0xFF)).astype(_jnp.float32)
                return DF(top, bot)  # unnormalized but exact as a sum

            acc = None
            for w in range(mod_size):
                s_lo = df_from_f64(np.float64(inv_scale) * (2.0 ** (64 * w)))
                s_hi = df_from_f64(np.float64(inv_scale)
                                   * (2.0 ** (64 * w + 32)))
                term = df_add(df_mul(u32_df(mag[w].lo), s_lo),
                              df_mul(u32_df(mag[w].hi), s_hi))
                acc = term if acc is None else df_add(acc, term)
            sign = _jnp.where(neg, _jnp.float32(-1.0), _jnp.float32(1.0))
            return DF(acc.hi * sign, acc.lo * sign)

        return jax.jit(body)(words)

    def build_floating_points(self, plain, threshold, decryption_modulus,
                              inv_scale):
        """CRT-compose multi-word integers to scaled complex doubles.

        plain: (mod_size, n) uint64 CRT limbs (little-endian words) of the
        composed value; values >= threshold (also mod_size words) are
        interpreted as negative (value - decryption_modulus). Runs on the
        host in float64 (parity with BuildFloatingPointsAVX512,
        fft-like-avx512.cpp).
        """
        plain = np.asarray(plain, dtype=np.uint64)
        mod_size, n = plain.shape
        thr = 0
        dec = 0
        for w in range(mod_size):
            thr |= int(threshold[w]) << (64 * w)
            dec |= int(decryption_modulus[w]) << (64 * w)
        out = np.zeros(n, dtype=np.complex128)
        for i in range(n):
            v = 0
            for w in range(mod_size):
                v |= int(plain[w, i]) << (64 * w)
            if v >= thr:
                v -= dec
            out[i] = float(v) * inv_scale
        return out
