"""Runtime configuration and kernel-path dispatch control.

The reference library dispatches per-call on CPU features with env-var kill
switches (HEXL_DISABLE_AVX512DQ/IFMA, hexl/util/cpu-features.hpp:15-33).
The TPU analogue: per-call dispatch between the Pallas kernel path and the
portable jnp (XLA) path, with env kill switches so CI can force every
fallback.

  HEXL_TPU_DISABLE_PALLAS=1   force the jnp path everywhere
  HEXL_TPU_DEBUG=1            enable input-range checking (host-side) on
                              public entry points (HEXL_CHECK analogue;
                              release path does zero validation, matching
                              the reference's contract)
"""

from __future__ import annotations

import os

import jax


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "").strip() not in ("", "0", "false", "False")


def pallas_disabled() -> bool:
    return _env_flag("HEXL_TPU_DISABLE_PALLAS")


def debug_checks() -> bool:
    return _env_flag("HEXL_TPU_DEBUG")


def default_backend() -> str:
    """'tpu' or 'cpu' — which platform jax will place our kernels on."""
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - no devices at all
        return "cpu"


def approx_mulhi_disabled() -> bool:
    """Kill switch for the approximate-mulhi Shoup butterflies in the
    Pallas kernels (exact lazy values for debugging/bit-audits)."""
    return _env_flag("HEXL_TPU_DISABLE_APPROX")


def ntt_backend() -> str:
    """Compute-body selection for the NTT/composite dispatchers.

    Measured on the current v5e toolchain (round 2, dependent-chain
    timings): XLA's own fusion of the staged bodies beats the hand-fused
    Pallas kernels at EVERY size (16.6 vs 28.8 us per fwd+inv pair at
    N=2^14/60-bit; 2.7 vs 16.3 us at N=2^10), so 'xla' is the default.
    HEXL_TPU_NTT_BACKEND=pallas restores the fused kernels (the round-1
    toolchain had the opposite ordering — re-measure per deployment).
    """
    v = os.environ.get("HEXL_TPU_NTT_BACKEND", "xla").lower()
    if v not in ("xla", "pallas"):
        raise ValueError(
            f"HEXL_TPU_NTT_BACKEND must be 'xla' or 'pallas'; got {v!r}")
    return v


def use_pallas() -> bool:
    """True when the fused Pallas bodies are selected AND runnable
    (TPU backend, not kill-switched); interpret-mode elsewhere is
    opt-in only."""
    if pallas_disabled() or ntt_backend() != "pallas":
        return False
    return default_backend() == "tpu"


def force_pallas_eltwise() -> bool:
    """Opt-in to the generic Pallas element-wise runner for standalone
    public eltwise ops (XLA fusion is faster for one-shot ops; see
    eltwise/ops.py)."""
    return _env_flag("HEXL_TPU_FORCE_PALLAS_ELTWISE")


def dist_overlap_slices() -> int:
    """Cross-phase overlap slicing for the distributed NTT.

    HEXL_TPU_DIST_OVERLAP=S (S > 1) splits each cross-phase exchange into
    S independent slice collectives so XLA's async-collective scheduler
    can overlap slice s's butterflies with slice s+1's all-to-all (the
    SNIPPETS.md §1 overlap pattern expressed at the collective level).
    0/unset = single blocking exchange per phase.
    """
    v = os.environ.get("HEXL_TPU_DIST_OVERLAP", "0")
    try:
        return int(v)
    except ValueError:
        raise ValueError(
            f"HEXL_TPU_DIST_OVERLAP must be an integer; got {v!r}") from None


_VALID_RADIX = (2, 4, 8, 16, 32, 64, 128)


def ntt_radix():
    """Per-phase stage-walker radix override for the XLA NTT bodies.

    Returns (phase_a_radix, phase_b_radix) from HEXL_TPU_NTT_RADIX
    (one power of two in [2, 128] for both phases or an "A,B" pair,
    e.g. "32,16"), or None when unset — the bodies then resolve the
    MEASURED per-size TPU defaults (jnp_ntt._TPU_NTT_RADIX_DEFAULTS,
    generated from benchmarks/dispatch_sweep_results.json; (2, 2) on
    non-TPU backends, where fusion only bloats compile time). The
    generic walker fuses log2(radix) butterfly stages per HBM
    materialization. History: with the round-3 'lean' butterflies the
    sweep favored "4,8" (16/32 lost to register pressure); the lighter
    round-5 lean8 butterflies flipped it — (32,16) wins at 2^14
    (7.80 vs 8.82 us/pair, dispatch_sweep 2026-08-21). Re-sweep per
    toolchain/butterfly change. N < 2^13 always walks radix-2.
    The reference ships radix-4 for the same cache-traffic reason
    (hexl/ntt/ntt-radix-4.cpp).
    """
    v = os.environ.get("HEXL_TPU_NTT_RADIX", "").strip()
    if not v:
        return None
    parts = v.split(",")
    if len(parts) == 1:
        parts = [parts[0], parts[0]]
    if len(parts) != 2:
        raise ValueError(
            f"HEXL_TPU_NTT_RADIX must be R or RA,RB; got {v!r}")
    try:
        ra, rb = int(parts[0]), int(parts[1])
    except ValueError:
        raise ValueError(
            f"HEXL_TPU_NTT_RADIX must be numeric; got {v!r}") from None
    if ra not in _VALID_RADIX or rb not in _VALID_RADIX:
        raise ValueError(
            f"HEXL_TPU_NTT_RADIX values must be powers of two in "
            f"[2, 128]; got {v!r}")
    return ra, rb


def fft_radix():
    """Per-phase stage-walker radix for the double-float FFT 2D bodies
    ((phase_a, phase_b), the ntt_radix analogue — the generic walker
    fuses log2(radix) butterfly stages per HBM materialization, and the
    small-N FFT is layout/HBM-bound per benchmarks/fft_profile.py).

    Returns None when HEXL_TPU_FFT_RADIX is unset: the walkers then
    resolve MEASURED per-backend, per-direction, per-size defaults
    (fft_like._fft_radix — fused on TPU, where the compiler never
    FMA-contracts f32 mul+add (benchmarks/float_path_ab.py) so the
    Dekker planes survive stage fusion bit-exactly; (2, 2) elsewhere:
    fusion is bit-identical eagerly but CORRUPTS the error planes under
    XLA-CPU jit — products duplicated across fusions get FMA-contracted
    in one copy, fwd error degrades 8e-15 -> 6e-8; measured
    2026-08-17). HEXL_TPU_FFT_RADIX=R or RA,RB (powers of two in
    [2, 128]) overrides both directions for per-backend A/B.
    """
    v = os.environ.get("HEXL_TPU_FFT_RADIX", "").strip()
    if not v:
        return None
    parts = v.split(",")
    if len(parts) == 1:
        parts = [parts[0], parts[0]]
    if len(parts) != 2:
        raise ValueError(
            f"HEXL_TPU_FFT_RADIX must be R or RA,RB; got {v!r}")
    try:
        ra, rb = int(parts[0]), int(parts[1])
    except ValueError:
        raise ValueError(
            f"HEXL_TPU_FFT_RADIX must be numeric; got {v!r}") from None
    if ra not in _VALID_RADIX or rb not in _VALID_RADIX:
        raise ValueError(
            f"HEXL_TPU_FFT_RADIX values must be powers of two in "
            f"[2, 128]; got {v!r}")
    return ra, rb


def ntt_pack() -> str:
    """Batch-pack the XLA NTT phase-B walk into full 128-lane tiles
    (the fft_pack scheme applied to the integer limb planes — for
    N < 2^14 the transposed phase-B minor dim lane_l = N/128 < 128
    under-fills the lane tile). Pure lane permutation, bit-identical.

    Modes: 'auto' (default — pack only the size classes where the A/B
    measured a win: lane_l in {32, 64}, i.e. N in {2^12, 2^13}, TPU
    only; benchmarks/ntt_pack_ab.py 2026-08-20: 2^13/60-bit pair
    9.81 -> 4.71 us (a pre-existing off-trend cliff), 2^12/49-bit
    -11%, but 2^10 is 12% SLOWER packed — the kb=16 pack shuffle costs
    more than the padding there), '1' (every lane_l < 128), '0' (off).
    """
    v = os.environ.get("HEXL_TPU_NTT_PACK", "").strip()
    if not v or v == "auto":
        return "auto"
    if v not in ("0", "1"):
        raise ValueError(
            f"HEXL_TPU_NTT_PACK must be 0, 1 or auto; got {v!r}")
    return v


def fft_pack() -> bool:
    """Batch-pack the DF FFT phase-B walk into full 128-lane tiles.

    For n < 2^14 the transposed phase-B layout has minor dim
    lane_l = n/128 < 128, so every vector op and HBM tile carries
    (128 - lane_l)/128 padding; packing kb = 128/lane_l polynomials
    side by side into the lane axis (the XLA-level analogue of
    pallas_ntt's packed small-N pipeline) restores full tiles. The
    pack replaces the tile transpose — same materialization count —
    and is a pure lane permutation, so results are bit-identical.
    Measured (lane-shape probe, 2026-08-20): full-lane elementwise
    runs 1.6-2.2x the narrow-minor rate. Default on for TPU;
    HEXL_TPU_FFT_PACK=0/1 overrides.
    """
    v = os.environ.get("HEXL_TPU_FFT_PACK", "").strip()
    if not v:
        return default_backend() == "tpu"
    if v not in ("0", "1"):
        raise ValueError(
            f"HEXL_TPU_FFT_PACK must be 0 or 1; got {v!r}")
    return v == "1"


def fft_backend() -> str:
    """Execution strategy for the small-N double-float FFT bodies:
    'xla' (default — staged 2D walk with radix-2^L stage fusion, see
    fft_radix) or 'pallas' (experimental/pallas_fft.py — the whole
    transform fused in one VMEM-resident kernel).

    The Pallas kernel is bit-equal on TPU but MEASURED SLOWER at every
    size on the current toolchain (2026-08-20: inv 4096 9.3 vs 3.5 us,
    1024 9.3 vs 0.76 us) — the same Mosaic-codegen verdict as the
    fused NTT kernels. The small-N FFT is layout/HBM-bound
    (fft_profile.py), but the winning fix was radix-2^L stage fusion
    in the XLA walk, not VMEM residency. Kept opt-in for per-toolchain
    re-A/B via HEXL_TPU_FFT_BACKEND=pallas.
    """
    v = os.environ.get("HEXL_TPU_FFT_BACKEND", "xla").strip()
    if v not in ("xla", "pallas"):
        raise ValueError(
            f"HEXL_TPU_FFT_BACKEND must be 'xla' or 'pallas'; got {v!r}")
    return v


def trace_config() -> tuple:
    """Hashable snapshot of every dispatch setting the traced bodies read
    at trace time (backend, stage-walker radixes, approx-mulhi, eltwise
    runner). Every jit cache in the package includes this in its key, so
    toggling an env switch mid-process (an in-process A/B) retraces
    instead of silently reusing the first-traced configuration."""
    return (ntt_backend(), ntt_radix(), ntt_pack(), fft_radix(),
            fft_backend(), fft_pack(), approx_butterflies(),
            force_pallas_eltwise(), dist_overlap_slices(),
            default_backend())


def approx_butterflies() -> bool:
    """Approximate-mulhi Shoup butterflies in the device NTT bodies.

    Mirrors the reference's hardware dispatch semantics: its AVX512-64
    lanes use approx-mulhi (values mod-q equal to native, lazy outputs
    not bit-identical, avx512-util.hpp:153-185) while the native path is
    exact. Here: approx on the TPU backend (measured -11% pair time at
    N=2^14), exact on CPU (where the XLA body doubles as the
    bit-exactness oracle). HEXL_TPU_DISABLE_APPROX=1 forces exact.
    """
    return not approx_mulhi_disabled() and default_backend() == "tpu"
