"""MXU (systolic-array) NTT — the four-step matmul formulation.

This is the TPU-first answer to the reference's best-performing arithmetic
regimes (the AVX512-IFMA q<2^50 path, hexl/ntt/fwd-ntt-avx512.cpp:20-43, and
the DQ-64 path): instead of shrinking the per-butterfly multiply count on
the VPU, it moves the O(N log N) multiply work onto the MXU, where this
chip multiplies ~50x faster (measured: bf16 matmul 152 T-MACs/s vs ~3 T
u32-multiply-equivalents/s on the VPU path).

Mathematical shape (four-step / Bailey decomposition of the negacyclic
NTT over Z_q[X]/(X^N+1), N = n1*n2):

    out[k] = sum_i x[i] psi^{(2k+1) i},  psi = minimal 2N-th root, w = psi^2
    i = i1 + n1*i2,  k = k2 + n2*k1:

    B[k2][i1]  = sum_{i2} x[i2*n1+i1] * psi^{n1 i2} w^{n1 i2 k2}   (matmul 1)
    C[k2][i1]  = B[k2][i1] * psi^{i1} w^{k2 i1}                    (twiddle)
    out[k2+n2*k1] = sum_{i1} C[k2][i1] * w^{n2 i1 k1}              (matmul 2)

Bit-reversed output order is obtained for free: with a = br_{n2}(k2),
b = br_{n1}(k1), the (a, b) result matrix reshaped row-major IS the
bit-reversed output array, so the permutations are folded into the
precomputed weight matrices (no device-side gathers).

Exact modular matmuls on the MXU:
  * operands are split into unsigned 7-bit digits held in bfloat16
    (integers < 2^8 are exact in bf16; 7x7-bit products are exact; f32
    accumulation of integers is exact below 2^24);
  * weights are pre-scaled per input digit, W^{(t)} = W * 2^{7t} mod q,
    so every product plane lives in ONE digit-exponent range:
        X @ W = sum_t X_t 2^{7t} @ W = sum_t X_t @ W^{(t)}   (mod q)
    and each W^{(t)} is itself split into 7-bit digit planes W^{(t)}_s;
  * a single einsum contracts (t, i) jointly; when the worst-case
    accumulator sum would reach 2^24 the t-axis is split into groups
    summed in int32.
Digit-plane results are carry-normalized on the VPU, the low 7*(dW-1)
bits are reassembled into 2x32-limb form, and the unnormalized top plane
R is folded with one Shoup multiply by rho = 2^{7(dW-1)} mod q. At the
pass boundary the elementwise twiddle is fused into that fold:
C = shoup(L, T) + shoup(R, rho*T) in [0, 4q).

Semantics match the staged kernels (jnp_ntt.py): forward IMF in {1,2,4},
OMF in {1,4} (lazy output here is [0,2q), a subset of the reference's
[0,4q) contract — values agree mod q); inverse IMF in {1,2}, OMF in {1,2}.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import nt
from ..limb import (U64, add64, cond_sub64, const64, mulhi64, mullo64,
                    sub64, to_limbs)

_BF16 = jnp.bfloat16
_F32 = jnp.float32
_I32 = jnp.int32
_U32 = jnp.uint32

DIGIT_BITS = 7
DIGIT_BASE = 1 << DIGIT_BITS          # 128
DIGIT_MASK = DIGIT_BASE - 1
_MAX_PROD = (DIGIT_BASE - 1) ** 2     # 127*127
_F32_EXACT = 1 << 24                  # f32 integers are exact below this

# The MXU regime is available for every modulus the engine accepts; weight
# tables grow as dX*dW*N bf16 entries, so cap the degree (2^18: ~47 MB for
# 62-bit q — still fine in HBM; above that the hierarchical path is used).
MXU_MAX_N = 1 << 18
MXU_MIN_N = 1 << 8


def _digits_needed(max_value: int) -> int:
    """Number of 7-bit digits to represent values in [0, max_value]."""
    return max(1, (int(max_value).bit_length() + DIGIT_BITS - 1)
               // DIGIT_BITS)


def _mulmod_scalar(a: np.ndarray, c: int, q: int) -> np.ndarray:
    """(a * c) mod q elementwise for uint64 a — exact via 32-bit split.

    a = ahi*2^32 + alo; both partial products are reduced in Python-int
    space only for the scalar constants, the per-element work stays in
    numpy uint64 (c_hi_red = (c * 2^32) mod q < 2^62, ahi < 2^32, so
    ahi * c_hi_red can overflow — reduce ahi mod q first and use the
    float-free double-split: all partials < 2^62 * 2^32 is still too big,
    so split ahi's product once more).
    """
    a = a.astype(np.uint64)
    c = int(c) % q
    # Split a into 21-bit pieces so piece * c_red < 2^21 * 2^62 overflows
    # still; instead split c's scaled residues and keep pieces < 2^22:
    # a = a2*2^42 + a1*2^21 + a0, each piece < 2^22.
    m21 = np.uint64((1 << 21) - 1)
    a0 = a & m21
    a1 = (a >> np.uint64(21)) & m21
    a2 = a >> np.uint64(42)
    c0 = np.uint64(c)
    c1 = np.uint64((c << 21) % q)
    c2 = np.uint64((c << 42) % q)
    # piece < 2^22, c_k < q < 2^62 -> product can exceed 2^64. Reduce each
    # c_k-multiplication with a second split of the piece (11+11 bits).
    def piece_mul(p, ck):
        ck = int(ck)
        lo = p & np.uint64((1 << 11) - 1)
        hi = p >> np.uint64(11)
        ck_hi = np.uint64((ck << 11) % q)
        # lo, hi < 2^11 and ck, ck_hi < q, so the two-product sum is
        # < 2^12 * q — that fits uint64 only for q < 2^52 (q in
        # (2^52, 2^53) overflowed here and corrupted every table for
        # 53-bit moduli). Otherwise fall back to Python ints for this
        # (rare, precompute-only) path.
        if q < (1 << 52):
            return (lo * np.uint64(ck) + hi * ck_hi) % np.uint64(q)
        return np.array([(int(x) * ck) % q for x in p], dtype=np.uint64)
    if q < (1 << 52):
        r = (piece_mul(a0, c0) + piece_mul(a1, c1) + piece_mul(a2, c2))
        return r % np.uint64(q)
    # Large-q correctness path (precompute only, vectorized object math).
    ao = a.astype(object)
    return ((ao * c) % q).astype(np.uint64)


def _digit_planes(w: np.ndarray, num: int) -> np.ndarray:
    """Split uint64 array into `num` unsigned 7-bit digit planes (f32)."""
    planes = np.empty((num,) + w.shape, dtype=np.float32)
    v = w.astype(np.uint64)
    for s in range(num):
        planes[s] = ((v >> np.uint64(DIGIT_BITS * s))
                     & np.uint64(DIGIT_MASK)).astype(np.float32)
    return planes


def _weight_tensor(wmat: np.ndarray, q: int, dx: int) -> np.ndarray:
    """Build the (dx, dw, n_in, n_out) bf16 digit weight tensor.

    wmat: (n_in, n_out) uint64 entries in [0, q).
    Plane [t, s] holds digit s of (wmat * 2^{7t} mod q).
    """
    dw = _digits_needed(q - 1)
    out = np.empty((dx, dw) + wmat.shape, dtype=np.float32)
    cur = wmat.astype(np.uint64)
    scale = pow(2, DIGIT_BITS, q)
    for t in range(dx):
        out[t] = _digit_planes(cur, dw)
        if t + 1 < dx:
            cur = _mulmod_scalar(cur, scale, q)
    return out


def _shoup_table(tab: np.ndarray, q: int) -> Tuple[U64, U64]:
    """Device (U64 w, U64 w_precon) pair for a host uint64 table < q."""
    precon = np.array([(int(v) << 64) // q for v in tab.reshape(-1)],
                      dtype=np.uint64).reshape(tab.shape)
    return to_limbs(tab), to_limbs(precon)


class MxuNttPlan:
    """Precomputed matmul weights + fold tables for one (N, q).

    Reference parity: plays the role of the per-bit-shift twiddle tables
    the reference NTT engine precomputes (hexl/ntt/ntt-internal.cpp:54-169)
    for its fastest regime; here the "twiddles" are whole DFT matrices in
    digit-plane form plus Shoup-preconditioned fold/twiddle tables.
    """

    def __init__(self, degree: int, modulus: int, root: int | None = None):
        if degree < MXU_MIN_N or degree > MXU_MAX_N:
            raise ValueError("degree outside MXU regime")
        self.n = degree
        self.q = modulus
        log_n = nt.log2_exact(degree)
        self.log_n = log_n
        if root is None:
            root = nt.minimal_primitive_root(2 * degree, modulus)
        self.root = root
        q = modulus
        psi = root
        w = (psi * psi) % q
        n2 = 1 << (log_n // 2)          # contracted axis of pass 1
        n1 = degree // n2               # n1 >= n2
        self.n1, self.n2 = n1, n2
        b2, b1 = nt.log2_exact(n2), nt.log2_exact(n1)

        # Digit counts. Forward pass-1 input < 4q (IMF<=4); the fused
        # twiddle/fold output C < 4q feeds pass 2. Inverse input < 2q.
        self.dw = _digits_needed(q - 1)
        self.dx_fwd = _digits_needed(4 * q - 1)
        self.dx_inv = _digits_needed(2 * q - 1)
        # Mid-pipeline values are < 4q for both directions.
        self.dx_mid = _digits_needed(4 * q - 1)

        # rho folds the unnormalized top digit plane: value = L + R*rho.
        self.rho = pow(2, DIGIT_BITS * (self.dw - 1), q)

        br1 = np.array([nt.reverse_bits(i, b1) for i in range(n1)])
        br2 = np.array([nt.reverse_bits(i, b2) for i in range(n2)])

        # ---- forward matrices ----
        # Wa[i2][a] = psi^{n1 i2} * w^{n1 i2 br2(a)}
        i2 = np.arange(n2)
        e_rows = [pow(psi, int(n1 * v), q) for v in i2]
        w_n1 = pow(w, n1, q)            # order n2
        wa = np.empty((n2, n2), dtype=np.uint64)
        for r in range(n2):
            base = pow(w_n1, int(r), q)   # w^{n1 r}
            row = self._power_row(base, n2, q)
            wa[r] = (np.uint64(e_rows[r]) * row[br2]) % np.uint64(q) \
                if q < (1 << 32) else _mulmod_scalar(row[br2], e_rows[r], q)
        # Wb[i1][b] = w^{n2 i1 br1(b)}
        w_n2 = pow(w, n2, q)            # order n1
        wb = np.empty((n1, n1), dtype=np.uint64)
        for r in range(n1):
            base = pow(w_n2, int(r), q)
            row = self._power_row(base, n1, q)
            wb[r] = row[br1]
        # T[a][i1] = psi^{i1} * w^{br2(a) i1}
        tmat = np.empty((n2, n1), dtype=np.uint64)
        psi_row = self._power_row(psi, n1, q)      # psi^{i1}
        for a in range(n2):
            base = pow(w, int(br2[a]), q)
            row = self._power_row(base, n1, q)     # w^{br2(a) i1}
            tmat[a] = self._rowmul(row, psi_row, q)

        # ---- inverse matrices ----
        # Pass i1: WbInv[b][i1] = w^{-n2 i1 br1(b)}
        w_n2_inv = nt.inverse_mod(w_n2, q)
        wbi = np.empty((n1, n1), dtype=np.uint64)
        for b in range(n1):
            base = pow(w_n2_inv, int(br1[b]), q)
            wbi[b] = self._power_row(base, n1, q)
        # TInv[a][i1] = N^{-1} psi^{-i1} w^{-br2(a) i1}
        n_inv = nt.inverse_mod(degree, q)
        psi_inv = nt.inverse_mod(psi, q)
        w_inv = nt.inverse_mod(w, q)
        tinv = np.empty((n2, n1), dtype=np.uint64)
        psi_inv_row = self._power_row(psi_inv, n1, q)
        psi_inv_row = _mulmod_scalar(psi_inv_row, n_inv, q)
        for a in range(n2):
            base = pow(w_inv, int(br2[a]), q)
            row = self._power_row(base, n1, q)
            tinv[a] = self._rowmul(row, psi_inv_row, q)
        # WaInv[a][i2] = psi^{-n1 i2} w^{-n1 i2 br2(a)}
        psi_n1_inv = nt.inverse_mod(pow(psi, n1, q), q)
        w_n1_inv = nt.inverse_mod(w_n1, q)
        wai = np.empty((n2, n2), dtype=np.uint64)
        for a in range(n2):
            base = (pow(w_n1_inv, int(br2[a]), q) * psi_n1_inv) % q
            wai[a] = self._power_row(base, n2, q)

        # ---- device tensors ----
        # Weights are stored 2D as W2[(t, i), (s, o)] so each pass is ONE
        # dot_general of a small matrix against the wide digit-stacked
        # data — the orientation this chip's MXU path runs at full rate
        # (measured: (128,128)@(128,wide) 152 T-MACs/s vs 2.6 for the
        # tall-LHS orientation).
        def dev_w(mat, dx):
            wt = _weight_tensor(mat, q, dx)      # (dx, dw, n_in, n_out)
            dw, n_in, n_out = wt.shape[1], wt.shape[2], wt.shape[3]
            w2 = wt.transpose(0, 2, 1, 3).reshape(dx * n_in, dw * n_out)
            return jnp.asarray(w2, dtype=_BF16)

        self.wa = dev_w(wa, self.dx_fwd)          # ((t,i2), (s,a))
        self.wb = dev_w(wb, self.dx_mid)          # ((t,i1), (s,b))
        self.wbi = dev_w(wbi, self.dx_inv)        # ((t,b),  (s,i1))
        self.wai = dev_w(wai, self.dx_mid)        # ((t,a),  (s,i2))

        # Fused twiddle/fold tables (forward: T on (a, i1); inverse: TInv
        # used on values laid out (i1, ..., a) — stored transposed).
        rho = self.rho
        self.t_tab = _shoup_table(tmat, q)
        self.rho_t_tab = _shoup_table(_mulmod_scalar(tmat, rho, q), q)
        tinv_t = np.ascontiguousarray(tinv.T)
        self.ti_tab = _shoup_table(tinv_t, q)
        self.rho_ti_tab = _shoup_table(
            _mulmod_scalar(tinv_t, rho, q), q)
        rho_arr = np.full((), rho, dtype=np.uint64)
        self.rho_tab = _shoup_table(rho_arr, q)
        self.rho_precon = (rho << 64) // q
        self.mu = (1 << 64) // q        # final Barrett constant

        # Contraction group size: largest t-count whose worst-case f32
        # accumulator stays exact. Pass-1 contracts n2, pass-2 n1.
        def groups(dx, n_in):
            g = max(1, _F32_EXACT // (_MAX_PROD * n_in))
            return [list(range(i, min(i + g, dx)))
                    for i in range(0, dx, g)]
        self.groups_fwd1 = groups(self.dx_fwd, n2)
        self.groups_fwd2 = groups(self.dx_mid, n1)
        self.groups_inv1 = groups(self.dx_inv, n1)
        self.groups_inv2 = groups(self.dx_mid, n2)

    @staticmethod
    def _power_row(base: int, n: int, q: int) -> np.ndarray:
        """[base^0, base^1, ..., base^{n-1}] mod q as uint64."""
        row = np.empty(n, dtype=np.uint64)
        v = 1
        for i in range(n):
            row[i] = v
            v = (v * base) % q
        return row

    @staticmethod
    def _rowmul(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray:
        """Elementwise (a*b) mod q for uint64 rows (exact)."""
        return np.array([(int(x) * int(y)) % q for x, y in zip(a, b)],
                        dtype=np.uint64)


_MXU_CACHE: Dict[Tuple[int, int], MxuNttPlan] = {}
_MXU_LOCK = threading.Lock()


def get_mxu_plan(degree: int, modulus: int,
                 root: int | None = None) -> MxuNttPlan:
    key = (degree, modulus)
    plan = _MXU_CACHE.get(key)
    if plan is None:
        with _MXU_LOCK:
            plan = _MXU_CACHE.get(key)
            if plan is None:
                with jax.ensure_compile_time_eval():
                    plan = MxuNttPlan(degree, modulus, root)
                _MXU_CACHE[key] = plan
    return plan


def clear_mxu_cache() -> None:
    with _MXU_LOCK:
        _MXU_CACHE.clear()


# ---------------------------------------------------------------------------
# Device pipeline
# ---------------------------------------------------------------------------

def _split_digits_lead(x: U64, dx: int):
    """U64 (n_in, ...) -> bf16 digit planes ((dx, n_in), flat_rest).

    Digit t covers bits [7t, 7t+7) of the 64-bit value; digits crossing
    the 32-bit limb boundary are assembled with static funnel shifts.
    The digit axis stacks in FRONT of the contraction axis so the result
    reshapes straight into the (dx*n_in, rest) dot operand.
    """
    n_in = x.lo.shape[0]
    rest = 1
    for d in x.lo.shape[1:]:
        rest *= d
    planes = []
    for t in range(dx):
        lo_bit = DIGIT_BITS * t
        hi_bit = lo_bit + DIGIT_BITS
        if hi_bit <= 32:
            d = (x.lo >> lo_bit) & np.uint32(DIGIT_MASK)
        elif lo_bit >= 32:
            d = (x.hi >> (lo_bit - 32)) & np.uint32(DIGIT_MASK)
        else:
            d = ((x.lo >> lo_bit) | (x.hi << (32 - lo_bit))) \
                & np.uint32(DIGIT_MASK)
        planes.append(d.astype(_I32).astype(_BF16))
    return jnp.stack(planes, axis=0).reshape(dx * n_in, rest)


def _matmul_digits(x2d, w2d, groups, n_in: int):
    """Exact modular-digit matmul: planes = W2ᵀ @ X̂.

    x2d: (dx*n_in, rest) bf16 digit-stacked data.
    w2d: (dx*n_in, dw*n_out) bf16 digit weights W2[(t,i),(s,o)].
    Contraction runs in t-row groups so every f32 accumulator stays an
    exact integer (< 2^24); groups are summed in int32.
    Returns int32 planes (dw*n_out, rest).
    """
    total = None
    for grp in groups:
        r0, r1 = grp[0] * n_in, (grp[-1] + 1) * n_in
        part = jax.lax.dot_general(
            w2d[r0:r1], x2d[r0:r1],
            (((0,), (0,)), ((), ())),
            preferred_element_type=_F32).astype(_I32)
        total = part if total is None else total + part
    return total


def _fold_planes(planes2d, dw: int, out_shape):
    """Carry-normalize int32 digit planes -> (U64 low part L, u32 top R).

    planes2d: (dw*n_out, rest) nonnegative int32 sums; out_shape is the
    value shape (n_out, ...rest dims...).
    L = sum_{s<dw-1} D_s 2^{7s} < 2^{7(dw-1)} (<= 2^56 for dw <= 9);
    R = unnormalized top plane, < 2^28.
    """
    planes = planes2d.astype(_U32).reshape((dw,) + tuple(out_shape))
    return _carry_norm_rows(list(planes), dw)


def _shoup_tab(x: U64, tab: Tuple[U64, U64], q: U64) -> U64:
    """Shoup multiply by a precomputed table (w, w_precon); out [0, 2q)."""
    w, wp = tab
    q_hat = mulhi64(x, wp)
    return sub64(mullo64(x, w), mullo64(q_hat, q))


def _u32_to_u64(r) -> U64:
    return U64(jnp.zeros_like(r), r)


def _transpose_u64(x: U64, perm) -> U64:
    return U64(jnp.transpose(x.hi, perm), jnp.transpose(x.lo, perm))


def _twiddle_fuse(lo_part: U64, r_top, t_tab, rho_t_tab, q: U64) -> U64:
    """C = L*T + R*(rho*T) mod q, in [0, 4q) (fused fold + twiddle)."""
    a = _shoup_tab(lo_part, t_tab, q)
    b = _shoup_tab(_u32_to_u64(r_top), rho_t_tab, q)
    return add64(a, b)


def _final_value(lo_part: U64, r_top, plan, q: U64) -> U64:
    """V = L + R*rho folded and Barrett-reduced to [0, 2q)."""
    r = _shoup_tab(_u32_to_u64(r_top), plan.rho_tab, q)
    v = add64(lo_part, r)
    q_hat = mulhi64(v, const64(plan.mu))
    return sub64(v, mullo64(q_hat, q))


# ---------------------------------------------------------------------------
# Pallas-fused recombination (fold + twiddle / fold + Barrett).
#
# The digit-plane fold and the Shoup chains are the pipeline's VPU cost
# center (measured ~6 us/poly per pass as XLA ops at N=2^14); fusing them
# into one VMEM-resident kernel removes the intermediate materializations.
# The matmuls stay in XLA (the MXU path is efficient there); only the
# per-point recombination work moves into Pallas.
# ---------------------------------------------------------------------------

def _pick_col_block(batch: int, n_in: int) -> int:
    """Columns are (batch, n_in)-major; block k batch elements per step.

    Target at least one full 128-lane tile per block (small n_in packs
    several batch elements side by side) without exceeding ~512 lanes.
    """
    best = 1
    for k in range(1, batch + 1):
        if batch % k:
            continue
        if k * n_in > 512:
            break
        best = k
        if k * n_in >= 128 and k >= 4:
            break
    return best


def _plane_slices(block, dw: int, n_out: int):
    """Static row slices of a (dw*n_out, cols) block -> dw (n_out, cols)
    uint32 planes (row slicing is free; no relayout)."""
    return [block[s * n_out:(s + 1) * n_out, :].astype(_U32)
            for s in range(dw)]


def _carry_norm_rows(planes, dw: int):
    """Carry-normalize dw uint32 digit planes (any common shape) into
    (U64 low part L, unnormalized top plane R) — the shared loop behind
    both the XLA `_fold_planes` path and the Pallas fused kernels."""
    lo = jnp.zeros_like(planes[0])
    hi = jnp.zeros_like(lo)
    carry = jnp.zeros_like(lo)
    for s in range(dw - 1):
        v = planes[s] + carry
        d = v & np.uint32(DIGIT_MASK)
        carry = v >> DIGIT_BITS
        bit = DIGIT_BITS * s
        if bit + DIGIT_BITS <= 32:
            lo = lo | (d << bit)
        elif bit >= 32:
            hi = hi | (d << (bit - 32))
        else:
            lo = lo | (d << bit)
            hi = hi | (d >> (32 - bit))
    r_top = planes[dw - 1] + carry
    return U64(hi, lo), r_top


def _fold_twiddle_pallas(planes2d, plan, t_tab, rho_t_tab, n_out: int,
                         batch: int, n_in: int) -> U64:
    """Pallas-fused fold + twiddle: planes (dw*n_out, batch*n_in) int32
    -> C = L*T + R*(rho*T) in [0, 4q), value layout (n_out, batch, n_in).

    Blocks stay 2D ((dw*n_out) x (k*n_in)) so the sublane dimension is
    the full plane height; per-digit planes are free row slices.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .. import config as _config

    dw, q_int = plan.dw, plan.q
    k = _pick_col_block(batch, n_in)
    t_w, t_p = t_tab
    r_w, r_p = rho_t_tab

    def tile_u64(u: U64) -> U64:
        # Tables tiled to block width so the kernel stays strictly 2D
        # (Mosaic cannot split the lane dim when n_in < 128).
        # Tile along a NEW middle axis so element (o, j, i) = table[o, i]
        # matches the block's (batch-major, n_in-minor) column layout.
        if k == 1:
            return u
        return U64(jnp.broadcast_to(u.hi[:, None, :], (n_out, k, n_in))
                   .reshape(n_out, k * n_in),
                   jnp.broadcast_to(u.lo[:, None, :], (n_out, k, n_in))
                   .reshape(n_out, k * n_in))

    tw_t, tp_t = tile_u64(t_w), tile_u64(t_p)
    rw_t, rp_t = tile_u64(r_w), tile_u64(r_p)

    def kernel(pl_ref, twh, twl, tph, tpl, rwh, rwl, rph, rpl,
               out_hi, out_lo):
        planes = _plane_slices(pl_ref[...], dw, n_out)
        lo_part, r_top = _carry_norm_rows(planes, dw)
        q = const64(q_int)
        tw = (U64(twh[...], twl[...]), U64(tph[...], tpl[...]))
        rw = (U64(rwh[...], rwl[...]), U64(rph[...], rpl[...]))
        a = _shoup_tab(lo_part, tw, q)
        b = _shoup_tab(_u32_to_u64(r_top), rw, q)
        c = add64(a, b)
        out_hi[...] = c.hi
        out_lo[...] = c.lo

    x_spec = pl.BlockSpec((dw * n_out, k * n_in), lambda b: (0, b),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((n_out, k * n_in), lambda b: (0, b),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((n_out, k * n_in), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(batch // k,),
        in_specs=[x_spec] + [t_spec] * 8,
        out_specs=(o_spec, o_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_out, batch * n_in), jnp.uint32),
            jax.ShapeDtypeStruct((n_out, batch * n_in), jnp.uint32),
        ),
        interpret=_config.default_backend() != "tpu",
    )
    hi, lo = call(planes2d, tw_t.hi, tw_t.lo, tp_t.hi, tp_t.lo,
                  rw_t.hi, rw_t.lo, rp_t.hi, rp_t.lo)
    return U64(hi.reshape(n_out, batch, n_in),
               lo.reshape(n_out, batch, n_in))


def _final_pallas(planes2d, plan, n_out: int, batch: int,
                  n_in: int) -> U64:
    """Pallas-fused fold + Barrett: planes -> V mod q in [0, 2q)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .. import config as _config

    dw, q_int = plan.dw, plan.q
    rho_wi, rho_pi = plan.rho, plan.rho_precon
    mu = plan.mu
    k = _pick_col_block(batch, n_in)

    def kernel(pl_ref, out_hi, out_lo):
        planes = _plane_slices(pl_ref[...], dw, n_out)
        lo_part, r_top = _carry_norm_rows(planes, dw)
        q = const64(q_int)
        r = _shoup_tab(_u32_to_u64(r_top),
                       (const64(rho_wi), const64(rho_pi)), q)
        v = add64(lo_part, r)
        q_hat = mulhi64(v, const64(mu))
        out = sub64(v, mullo64(q_hat, q))
        out_hi[...] = out.hi
        out_lo[...] = out.lo

    x_spec = pl.BlockSpec((dw * n_out, k * n_in), lambda b: (0, b),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((n_out, k * n_in), lambda b: (0, b),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(batch // k,),
        in_specs=[x_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_out, batch * n_in), jnp.uint32),
            jax.ShapeDtypeStruct((n_out, batch * n_in), jnp.uint32),
        ),
        interpret=_config.default_backend() != "tpu",
    )
    hi, lo = call(planes2d)
    return U64(hi.reshape(n_out, batch, n_in),
               lo.reshape(n_out, batch, n_in))


def _use_fused_recombine() -> bool:
    """Fuse the digit-plane fold + twiddle/Barrett into a Pallas kernel.

    Gated on its own terms (TPU backend + the Pallas kill switch), NOT on
    config.use_pallas(): that would tie the MXU regime's recombination to
    the NTT-backend selection, making the fusion unreachable under the
    default HEXL_TPU_NTT_BACKEND=xla and impossible to combine with the
    (faster) XLA staged bodies for the main dispatch."""
    from .. import config as _config
    return (not _config.pallas_disabled()
            and _config.default_backend() == "tpu")


def _boundary_fused(x: U64, dx, w2d, groups, plan, n_in, n_out,
                    t_tab, rho_t_tab, q) -> U64:
    """matmul pass + (fold + twiddle), Pallas-fused when enabled.

    x laid out (n_in, lead..., ); returns C (n_out, lead..., n_in2)
    where n_in2 is x's trailing axis.
    """
    n_tail = x.lo.shape[-1]
    batch = 1
    for d in x.lo.shape[1:-1]:
        batch *= d
    xd = _split_digits_lead(x, dx)
    planes2d = _matmul_digits(xd, w2d, groups, n_in)
    out_shape = (n_out,) + x.lo.shape[1:-1] + (n_tail,)
    if _use_fused_recombine():
        c = _fold_twiddle_pallas(planes2d, plan, t_tab, rho_t_tab,
                                 n_out, batch, n_tail)
        return U64(c.hi.reshape(out_shape), c.lo.reshape(out_shape))
    lo_p, r_top = _fold_planes(planes2d, plan.dw, out_shape)
    nl = len(out_shape) - 2

    def btab(tab):
        w, wp = tab
        sh = (n_out,) + (1,) * nl + (n_tail,)
        return (U64(w.hi.reshape(sh), w.lo.reshape(sh)),
                U64(wp.hi.reshape(sh), wp.lo.reshape(sh)))

    return _twiddle_fuse(lo_p, r_top, btab(t_tab), btab(rho_t_tab), q)


def _final_fused(x: U64, dx, w2d, groups, plan, n_in, n_out, q) -> U64:
    """matmul pass + (fold + Barrett to [0, 2q)), Pallas-fused."""
    n_tail = x.lo.shape[-1]
    batch = 1
    for d in x.lo.shape[1:-1]:
        batch *= d
    xd = _split_digits_lead(x, dx)
    planes2d = _matmul_digits(xd, w2d, groups, n_in)
    out_shape = (n_out,) + x.lo.shape[1:-1] + (n_tail,)
    if _use_fused_recombine():
        v = _final_pallas(planes2d, plan, n_out, batch, n_tail)
        return U64(v.hi.reshape(out_shape), v.lo.reshape(out_shape))
    lo_p, r_top = _fold_planes(planes2d, plan.dw, out_shape)
    return _final_value(lo_p, r_top, plan, q)


def fwd_ntt_mxu(x: U64, plan: MxuNttPlan, input_mod_factor: int = 1,
                output_mod_factor: int = 1) -> U64:
    """Forward negacyclic NTT via MXU matmuls; bit-reversed output.

    Input < IMF*q (IMF in {1,2,4}); output [0,q) for OMF=1, else [0,2q)
    (mod-q equal to the reference's lazy [0,4q) output).
    """
    if input_mod_factor not in (1, 2, 4):
        raise ValueError("input_mod_factor must be 1, 2 or 4")
    if output_mod_factor not in (1, 4):
        raise ValueError("output_mod_factor must be 1 or 4")
    n1, n2, q_int = plan.n1, plan.n2, plan.q
    q = const64(q_int)
    shape = x.lo.shape
    lead = shape[:-1]
    nl = len(lead)
    x = U64(x.hi.reshape(lead + (n2, n1)), x.lo.reshape(lead + (n2, n1)))
    # Pass 1 contracts i2: bring it to the front -> (n2, lead..., n1).
    x = _transpose_u64(x, (nl,) + tuple(range(nl)) + (nl + 1,))
    # Matmul + fused fold/twiddle: C (a, lead..., i1) in [0, 4q).
    c = _boundary_fused(x, plan.dx_fwd, plan.wa, plan.groups_fwd1, plan,
                        n2, n2, plan.t_tab, plan.rho_t_tab, q)
    # Pass 2 contracts i1: transpose (a, lead, i1) -> (i1, lead, a).
    c = _transpose_u64(c, (nl + 1,) + tuple(range(1, nl + 1)) + (0,))
    out = _final_fused(c, plan.dx_mid, plan.wb, plan.groups_fwd2, plan,
                       n1, n1, q)              # (b, lead..., a) in [0,2q)
    if output_mod_factor == 1:
        out = cond_sub64(out, q)
    # Natural output order is (lead..., a, b).
    out = _transpose_u64(out, tuple(range(1, nl + 1)) + (nl + 1, 0))
    return U64(out.hi.reshape(shape), out.lo.reshape(shape))


def inv_ntt_mxu(x: U64, plan: MxuNttPlan, input_mod_factor: int = 1,
                output_mod_factor: int = 1) -> U64:
    """Inverse negacyclic NTT from bit-reversed input via MXU matmuls.

    Input < IMF*q (IMF in {1,2}); output [0,q) for OMF=1 else [0,2q).
    """
    if input_mod_factor not in (1, 2):
        raise ValueError("input_mod_factor must be 1 or 2")
    if output_mod_factor not in (1, 2):
        raise ValueError("output_mod_factor must be 1 or 2")
    n1, n2, q_int = plan.n1, plan.n2, plan.q
    q = const64(q_int)
    shape = x.lo.shape
    lead = shape[:-1]
    nl = len(lead)
    x = U64(x.hi.reshape(lead + (n2, n1)), x.lo.reshape(lead + (n2, n1)))
    # Pass 1 contracts b (last axis): bring it to the front.
    x = _transpose_u64(x, (nl + 1,) + tuple(range(nl)) + (nl,))
    # Values come out (i1, lead..., a); TInv tables stored as (i1, a).
    c = _boundary_fused(x, plan.dx_inv, plan.wbi, plan.groups_inv1, plan,
                        n1, n1, plan.ti_tab, plan.rho_ti_tab, q)
    # Pass 2 contracts a: transpose (i1, lead, a) -> (a, lead, i1).
    c = _transpose_u64(c, (nl + 1,) + tuple(range(1, nl + 1)) + (0,))
    out = _final_fused(c, plan.dx_mid, plan.wai, plan.groups_inv2, plan,
                       n2, n2, q)         # (i2, lead..., i1) in [0,2q)
    if output_mod_factor == 1:
        out = cond_sub64(out, q)
    out = _transpose_u64(out, tuple(range(1, nl + 1)) + (0, nl + 1))
    return U64(out.hi.reshape(shape), out.lo.reshape(shape))
