"""CKKS key-switch — the deepest composite pipeline in the framework.

Chains inverse NTTs, RNS base conversion, lazy forward NTTs, 128-bit lazy
key-product accumulation, Barrett-128 flush, and the final mod-down with
the +qk/2 rounding trick. Behavioral parity with the reference's SEAL shim
(hexl/experimental/seal/key-switch-internal.cpp:25-201); the lazy ranges are
chained identically ((2,1) inverse feeds the RNS convert, (4,4) forwards
feed unreduced 128-bit accumulators, the (2,2) inverse feeds the +qk/2
trick, FMA runs at input_mod_factor 8).

TPU-native differences: the 128-bit accumulator is a 4x32-limb U128 array
on the VPU, and the 128-bit flush uses a two-step Barrett (reduce the high
word, fold with 2^64 mod q) instead of hardware 128/64 division.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import config, nt
from ..eltwise import jnp_kernels as K
from ..limb import (U64, U128, add128, add64, barrett_reduce_u64, const64,
                    from_limbs, mul64_wide, mult_mod_barrett, sub64,
                    to_limbs, zeros64)
from ..ntt import get_plan, jnp_ntt


def _barrett_reduce_128(t: U128, modulus: int) -> U64:
    """(t.hi * 2^64 + t.lo) mod q, exactly, for any 128-bit t.

    hi mod q and lo mod q via 64-bit Barrett, then fold:
    t mod q = (hi mod q)*(2^64 mod q) + (lo mod q)  (mod q).
    """
    q_barr = nt.barrett_factor(1, 64, modulus)
    hi_red = barrett_reduce_u64(t.hi, modulus, q_barr, 1)
    lo_red = barrett_reduce_u64(t.lo, modulus, q_barr, 1)
    r_mod_q = (1 << 64) % modulus
    folded = mult_mod_barrett(hi_red, const64(r_mod_q), modulus)
    return K.add_mod(folded, lo_red, modulus)


@functools.lru_cache(maxsize=None)
def _jitted_key_switch(n: int, decomp_modulus_size: int,
                       key_modulus_size: int, rns_modulus_size: int,
                       key_component_count: int, moduli: tuple,
                       modswitch_factors: tuple, use_pallas: bool = False):
    plans = {q: get_plan(n, q) for q in set(moduli)}
    if use_pallas:
        from ..ntt import pallas_ntt as ntt_impl
    else:
        ntt_impl = jnp_ntt

    def fn(result: U64, t_target: U64, keys: U64):
        # result:   (key_component_count, decomp_modulus_size, n)
        # t_target: (decomp_modulus_size, n)   (CKKS: in NTT form)
        # keys:     (decomp_modulus_size, key_component_count,
        #            key_modulus_size, n)
        def get(u, *idx):
            return U64(u.hi[idx], u.lo[idx])

        # Inverse NTT of the target per decomposition modulus: (2, 1).
        t_target_intt = []
        for j in range(decomp_modulus_size):
            qj = moduli[j]
            t = ntt_impl.inv_ntt(get(t_target, j), plans[qj], 2, 1)
            t_target_intt.append(t)

        t_poly_prod = [[None] * rns_modulus_size
                       for _ in range(key_component_count)]
        for i in range(rns_modulus_size):
            key_index = (key_modulus_size - 1
                         if i == decomp_modulus_size else i)
            qk = moduli[key_index]
            # Batch the j != i forward NTTs (all share modulus qk) into
            # ONE stacked transform: trace/compile cost per i drops from
            # ds NTT bodies to one, and the TPU runs one batched kernel
            # (reference unrolls per-j singles, key-switch-internal.cpp:
            # 58-90 — batching is the TPU-shaped restructuring).
            batch_js = [j for j in range(decomp_modulus_size) if j != i]
            t_ops = {}
            if batch_js:
                stack = []
                for j in batch_js:
                    tj = t_target_intt[j]
                    if moduli[j] > qk:
                        tj = K.reduce_mod(tj, qk, qk, 1)
                    stack.append(tj)
                stacked = U64(jnp.stack([s.hi for s in stack]),
                              jnp.stack([s.lo for s in stack]))
                fwd = ntt_impl.fwd_ntt(stacked, plans[qk], 4, 4)
                for pos, j in enumerate(batch_js):
                    t_ops[j] = U64(fwd.hi[pos], fwd.lo[pos])
            if i < decomp_modulus_size:
                t_ops[i] = get(t_target, i)  # original NTT form, < qi
            acc = [U128(zeros64((n,)), zeros64((n,)))
                   for _ in range(key_component_count)]
            for j in range(decomp_modulus_size):
                for k in range(key_component_count):
                    key_poly = get(keys, j, k, key_index)
                    prod = mul64_wide(t_ops[j], key_poly)
                    acc[k] = add128(acc[k], prod)
            for k in range(key_component_count):
                t_poly_prod[k][i] = _barrett_reduce_128(acc[k], qk)

        # Mod-down: fold the key modulus component into each qi.
        qk = moduli[key_modulus_size - 1]
        qk_half = qk >> 1
        out_parts = []
        for k in range(key_component_count):
            t_last = ntt_impl.inv_ntt(
                t_poly_prod[k][decomp_modulus_size], plans[qk], 2, 2)
            # +qk/2 rounding trick, full reduce to [0, qk).
            q_barr = nt.barrett_factor(1, 64, qk)
            t_last = barrett_reduce_u64(
                add64(t_last, const64(qk_half)), qk, q_barr, 1)
            comp = []
            for i in range(decomp_modulus_size):
                qi = moduli[i]
                if qk > qi:
                    t_ntt = K.reduce_mod(t_last, qi, qi, 1)
                else:
                    t_ntt = t_last
                fix = qi - nt.barrett_reduce_64(
                    qk_half, qi, nt.barrett_factor(1, 64, qi))
                t_ntt = add64(t_ntt, const64(fix))  # in [0, 2qi)
                t_ntt = ntt_impl.fwd_ntt(t_ntt, plans[qi], 4, 4)
                # (ct mod qi) - (ct mod qk), lazily in [0, 8qi)
                t_ith = sub64(add64(t_poly_prod[k][i], const64(4 * qi)),
                              t_ntt)
                # x qk^{-1} mod qi at input_mod_factor 8
                t_ith = K.fma_mod(t_ith, modswitch_factors[i], None, qi, 8)
                acc_out = K.add_mod(get(result, k, i), t_ith, qi)
                comp.append(acc_out)
            out_parts.append(comp)

        hi = jnp.stack([jnp.stack([p.hi for p in comp])
                        for comp in out_parts])
        lo = jnp.stack([jnp.stack([p.lo for p in comp])
                        for comp in out_parts])
        return U64(hi, lo)

    return jax.jit(fn)


def key_switch(result, t_target, n: int, decomp_modulus_size: int,
               key_modulus_size: int, rns_modulus_size: int,
               key_component_count: int, moduli: Sequence[int],
               key_switch_keys, modswitch_factors: Sequence[int]):
    """CKKS key switch; accumulates into `result` and returns it.

    result:            (key_component_count, decomp_modulus_size, n)
    t_target:          (decomp_modulus_size, n), NTT form
    key_switch_keys:   (decomp_modulus_size, key_component_count,
                        key_modulus_size, n)
    moduli:            key_modulus_size moduli (decomp primes + key prime)
    modswitch_factors: decomp_modulus_size factors qk^{-1} mod qi
    """
    moduli = tuple(int(q) for q in moduli)
    modswitch_factors = tuple(int(f) for f in modswitch_factors)
    from ..limb import coerce_limbs
    r, r_host = coerce_limbs(result)
    t, t_host = coerce_limbs(t_target)
    k, _ = coerce_limbs(key_switch_keys)
    host = r_host or t_host
    plan0 = get_plan(n, moduli[0])
    use_pallas = config.use_pallas() and plan0.rows is not None
    fn = _jitted_key_switch(n, decomp_modulus_size, key_modulus_size,
                            rns_modulus_size, key_component_count, moduli,
                            modswitch_factors, use_pallas)
    out = fn(r, t, k)
    return from_limbs(out) if host else out
