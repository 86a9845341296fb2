"""Fused Pallas TPU kernel for the small-N double-float FFT-like
(OPT-IN: HEXL_TPU_FFT_BACKEND=pallas — measured slower than the XLA
walk at every size on the current toolchain; see config.fft_backend).

fft_profile.py (round 4) decomposed the N=4096 transform: the per-stage
HBM materialization of the four f32 planes is ~2.0-2.3 us of the ~4 us
call — the small-N FFT is LAYOUT-bound, not ALU-bound (the opposite of
the NTT, whose staged XLA bodies win end-to-end). This kernel removes
that floor by VMEM residency: one `pallas_call` runs every stage of the
2D walk back-to-back on a block of kb polynomials, reading and writing
each coefficient plane once. MEASURED VERDICT (2026-08-20, bit-equal
outputs): Mosaic's codegen loses more than the residency wins — inv
4096 9.3 us vs the XLA walk's 3.5 us, 1024 9.3 vs 0.76 — mirroring the
fused-NTT reversal (mosaic_df_bfly_ab.py pins the butterfly gap alone
at 1.5x). The winning fix for the layout floor was radix-2^L stage
fusion in the XLA walk (config.fft_radix); this kernel stays as the
re-checkable per-toolchain A/B artifact.

The stage walk and butterflies are the SAME functions the XLA path
traces (hexl_tpu/experimental/fft_like.py `_fwd_2d_df`/`_inv_2d_df`):
only residency differs, so outputs are bit-identical per backend A/B.
Twiddle tables ride in as kernel operands with constant index maps
(DMA'd to VMEM once, reused across grid steps). Scalars (scale fusion,
the final inverse twiddle) fold into the jaxpr as numpy literals —
Pallas rejects captured array constants.

Reference analogue: the reference fuses its whole FFT-like in one
AVX512 kernel per direction (hexl/experimental/fft-like/
fwd-fft-like-avx512.cpp); this is the TPU-native equivalent with the
VMEM block replacing the register file.

Ceiling: the functional body keeps every stage's temporaries live on
Mosaic's VMEM stack; blocks are capped at kb*rows <= 128 sublane-rows
(plenty for the n <= 2^13 sizes this path serves — larger transforms
are ALU-bound and stay on the XLA staged walk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from .df32 import CDF, DF, cdf_to_complex128, df_to_f64

# Largest degree routed to the fused kernel by default: at 2^14 and
# above the staged XLA walk is ALU-bound (fft_profile.py) and fusion
# buys nothing; below, the layout floor dominates and fusion removes it.
PALLAS_FFT_MAX_N = 1 << 13

_LANES = 128


def _np_df(v: float) -> DF:
    """Python float -> DF of numpy scalars (jaxpr literals in-kernel)."""
    hi = np.float32(v)
    return DF(hi, np.float32(np.float64(v) - np.float64(hi)))


def _np_cdf(z: complex) -> CDF:
    return CDF(_np_df(float(np.real(z))), _np_df(float(np.imag(z))))


def _stage_planes(stages):
    """Flatten [(m, t, w:CDF, _)] into f32 planes. Phase-A tables (1-D,
    (m,)) are DENSIFIED to the full (m, t/128, 128) stage shape here,
    outside the kernel: Mosaic cannot lower a (m,1,1) -> (m,t,128)
    broadcast ("Broadcast in both sublanes and lanes"), and a dense
    table turns the butterfly product into a plain elementwise multiply.
    Phase-B tables (3-D) broadcast only into sublanes and stay sliced."""
    planes = []
    for m, t, w, _ in stages:
        for p in (w.re.hi, w.re.lo, w.im.hi, w.im.lo):
            if p.ndim == 1:
                planes.append(jnp.broadcast_to(
                    p[:, None, None], (m, max(1, t // _LANES), _LANES)))
            else:
                planes.append(p)
    return planes


def _load_stages(stages_meta, refs, offset):
    """Rebuild [(m, t, CDF w, None)] from kernel refs (values)."""
    out = []
    i = offset
    for m, t, _, _ in stages_meta:
        vals = [refs[i + j][...] for j in range(4)]
        i += 4
        out.append((m, t, CDF(DF(vals[0], vals[1]), DF(vals[2], vals[3])),
                    None))
    return out, i


def _block_kb(batch: int, rows: int) -> int:
    """Polys per grid step: cap the block at 128 sublane-rows and make
    it divide the batch."""
    kb = max(1, min(batch, _LANES // rows))
    while batch % kb:
        kb -= 1
    return kb


def _run(x: CDF, fft, scalar, forward: bool) -> CDF:
    from . import fft_like as FL

    n, rows = fft.n, fft._rows
    tiles, lane_l = fft._tiles, fft._lane_l
    shape = x.re.hi.shape
    batch = 1
    for d in shape[:-1]:
        batch *= d
    x3 = jax.tree.map(lambda p: p.reshape(batch, rows, _LANES), x)
    kb = _block_kb(batch, rows)

    st = fft._st_fwd if forward else fft._st_inv
    s_meta0, s_meta1 = list(st[0]), list(st[1])
    tw_planes = _stage_planes(s_meta0) + _stage_planes(s_meta1)

    # Scalars enter as numpy literals (no captured arrays in-kernel).
    # _np_df reproduces df_from_f64's split exactly, so results stay
    # bit-identical to the XLA walk consuming the DF form.
    if scalar is None:
        scal_np = None
    elif isinstance(scalar, DF):
        # The kernel consumes the scalar as numpy literals re-split from
        # one f64; a DF whose hi+lo carries more precision than one f64
        # would be silently altered relative to the XLA walk (which
        # consumes the DF form directly) — reject it instead.
        f = float(df_to_f64(scalar))
        rt = _np_df(f)
        if (float(np.asarray(scalar.hi)) != float(rt.hi)
                or float(np.asarray(scalar.lo)) != float(rt.lo)):
            raise ValueError(
                "pallas FFT backend requires a DF scalar exactly "
                "representable as one f64 (hi+lo round-trip); use the "
                "XLA backend for wider-than-f64 scalars")
        scal_np = rt
    else:
        scal_np = _np_df(float(scalar))
    wf_np = None
    if not forward:
        wf_np = _np_cdf(complex(cdf_to_complex128(
            jax.tree.map(lambda p: np.asarray(p)[None], fft._w_final))[0]))

    def kernel(*refs):
        s0, i = _load_stages(s_meta0, refs, 4)
        s1, i = _load_stages(s_meta1, refs, i)
        # One poly at a time: the walkers then act on 2-D (rows, 128)
        # planes, whose (m,1,1) -> (m,t,128) table broadcasts Mosaic
        # implements (the fused NTT kernel's pattern). A batched
        # (kb, rows, 128) walk needs (1,m,1,1) -> (kb,m,t,128)
        # broadcasts — "Broadcast in both sublanes and lanes: not
        # implemented". Per-poly output stores also bound the VMEM
        # stack to one poly's stage temporaries.
        for b in range(kb):
            xv = CDF(DF(refs[0][b], refs[1][b]),
                     DF(refs[2][b], refs[3][b]))
            xv = jax.tree.map(lambda p: p.reshape(n), xv)
            # radix=2 in-kernel: stage pairing only saves HBM
            # materializations, which don't exist in VMEM, and the
            # dense phase-A tables are built per radix-2 stage.
            if forward:
                out = FL._fwd_2d_df(xv, (s0, s1), n, rows, tiles,
                                    lane_l, scal_np, radix=2)
            else:
                out = FL._inv_2d_df(xv, (s0, s1), n, rows, tiles,
                                    lane_l, wf_np, scal_np, radix=2)
            out = jax.tree.map(lambda p: p.reshape(rows, _LANES), out)
            for j, v in enumerate((out.re.hi, out.re.lo, out.im.hi,
                                   out.im.lo)):
                refs[i + j][b] = v

    x_spec = pl.BlockSpec((kb, rows, _LANES), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    tw_specs = [
        pl.BlockSpec(p.shape, (lambda *_, nd=p.ndim: (0,) * nd),
                     memory_space=pltpu.VMEM)
        for p in tw_planes
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(batch // kb,),
        in_specs=[x_spec] * 4 + tw_specs,
        out_specs=[x_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((batch, rows, _LANES),
                                        jnp.float32)] * 4,
        interpret=config.default_backend() != "tpu",
    )(x3.re.hi, x3.re.lo, x3.im.hi, x3.im.lo, *tw_planes)
    out = CDF(DF(outs[0], outs[1]), DF(outs[2], outs[3]))
    return jax.tree.map(lambda p: p.reshape(shape), out)


def fwd_fft_df(x: CDF, fft, scalar=None) -> CDF:
    """Forward DF transform as one fused kernel (CDF -> CDF).

    `scalar`, when given, must be a host float (the fused
    (1/scalar)-scale of the reference forward); per-element results are
    bit-identical to the XLA 2D walk of the same radix.
    """
    return _run(x, fft, scalar, True)


def inv_fft_df(x: CDF, fft, scalar=None) -> CDF:
    """Inverse DF transform as one fused kernel (CDF -> CDF)."""
    return _run(x, fft, scalar, False)
