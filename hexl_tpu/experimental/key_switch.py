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

from .. import nt
from ..eltwise import jnp_kernels as K
from ..limb import (U64, U128, add128, add64, barrett_reduce_u64, const64,
                    from_limbs, mul64_wide, mult_mod_barrett, sub64,
                    to_limbs, zeros64)
from ..ntt import get_plan, jnp_ntt
from ..ntt.rns import fwd_ntt_rns, get_rns_plan, inv_ntt_rns


def _barrett_reduce_128(t: U128, modulus: int) -> U64:
    """(t.hi * 2^64 + t.lo) mod q, exactly, for any 128-bit t.

    hi mod q and lo mod q via 64-bit Barrett, then fold:
    t mod q = (hi mod q)*(2^64 mod q) + (lo mod q)  (mod q).
    """
    q_barr = nt.barrett_factor(1, 64, modulus)
    # Fully-reduced outputs are bit-identical between the exact and
    # approx-quotient forms, so the flush follows the eltwise dispatch
    # rule (K._approx: approx on TPU, exact on CPU/oracle).
    from ..limb import barrett_reduce_u64_approx, mult_mod_barrett_approx
    br = barrett_reduce_u64_approx if K._approx() else barrett_reduce_u64
    mm = mult_mod_barrett_approx if K._approx() else mult_mod_barrett
    hi_red = br(t.hi, modulus, q_barr, 1)
    lo_red = br(t.lo, modulus, q_barr, 1)
    r_mod_q = (1 << 64) % modulus
    folded = mm(hi_red, const64(r_mod_q), modulus)
    return K.add_mod(folded, lo_red, modulus)


def _barrett_reduce_128_rows(t: U128, row_moduli) -> U64:
    """Stacked _barrett_reduce_128: t has a leading rows axis; row i is
    reduced mod row_moduli[i] (per-row Barrett constants broadcast over
    the trailing axes). Requires a shared modulus bit length (static
    generalized-Barrett shift). Exact (not approx) quotients — the
    fully-reduced output is bit-identical to the per-row singles."""
    from ..limb import cond_sub64_half, mulhi64, mullo64, shr128_to64

    n_bits = int(row_moduli[0]).bit_length()
    assert all(int(q).bit_length() == n_bits for q in row_moduli)
    extra = t.hi.hi.ndim - 1

    def vec(vals):
        a = np.array([int(v) for v in vals], dtype=np.uint64)
        lim = to_limbs(a)
        idx = (slice(None),) + (None,) * extra
        return U64(lim.hi[idx], lim.lo[idx])

    q_vec = vec(row_moduli)
    q_barr = vec([nt.barrett_factor(1, 64, int(q)) for q in row_moduli])
    r_mod = vec([(1 << 64) % int(q) for q in row_moduli])
    mu = vec([(1 << (n_bits + 62)) // int(q) for q in row_moduli])
    shift = n_bits - 2

    def br(x):
        q_hat = mulhi64(x, q_barr)
        r = sub64(x, mullo64(q_hat, q_vec))
        return cond_sub64_half(r, q_vec)  # r < 2q

    hi_red = br(t.hi)
    lo_red = br(t.lo)
    # folded = hi_red * (2^64 mod q) mod q — generalized Barrett with
    # traced per-row operands (mirrors limb.mult_mod_barrett).
    prod = mul64_wide(hi_red, r_mod)
    c1 = shr128_to64(prod, shift)
    q_hat = mulhi64(c1, mu)
    z = sub64(prod.lo, mullo64(q_hat, q_vec))
    folded = cond_sub64_half(z, q_vec)  # z < 2q
    s = add64(folded, lo_red)
    return cond_sub64_half(s, q_vec)  # s < 2q


@functools.lru_cache(maxsize=None)
def _jitted_key_switch(n: int, decomp_modulus_size: int,
                       key_modulus_size: int, rns_modulus_size: int,
                       key_component_count: int, moduli: tuple,
                       modswitch_factors: tuple, _cfg=None):
    # _cfg = config.trace_config(): the body reads the radix/approx
    # switches at trace time, so env toggles must retrace.
    plans = {q: get_plan(n, q) for q in set(moduli)}
    ds = decomp_modulus_size
    # Stacked multi-modulus transforms over the decomposition basis: every
    # NTT group below whose calls differ only in the modulus becomes ONE
    # vmapped RNS transform (ntt/rns.py) — k batch-1 singles are
    # occupancy-bound on TPU. Falls back to per-modulus singles when the
    # decomp primes are not distinct (degenerate, but legal input).
    rns_plan = None
    if ds > 1 and len(set(moduli[:ds])) == ds:
        rns_plan = get_rns_plan(n, moduli[:ds])

    from ..ntt.rns import _stack_u64 as stack_u64

    def fn(result: U64, t_target: U64, keys: U64):
        # result:   (key_component_count, decomp_modulus_size, n)
        # t_target: (decomp_modulus_size, n)   (CKKS: in NTT form)
        # keys:     (decomp_modulus_size, key_component_count,
        #            key_modulus_size, n)
        def get(u, *idx):
            return U64(u.hi[idx], u.lo[idx])

        # Inverse NTT of the target per decomposition modulus: (2, 1) —
        # one stacked transform over the whole decomp basis.
        if rns_plan is not None:
            t_intt = inv_ntt_rns(t_target, rns_plan, 2, 1)
            t_target_intt = [get(t_intt, j) for j in range(ds)]
        else:
            t_target_intt = [
                jnp_ntt.inv_ntt(get(t_target, j), plans[moduli[j]], 2, 1)
                for j in range(ds)]

        # Forward NTTs of the base-converted targets. For i < ds the
        # modulus is moduli[i] and the batch is the ds-1 polys j != i; all
        # ds of those batches run as ONE stacked (ds, ds-1, n) transform.
        # The i == ds group (key modulus) is a single batched transform.
        # (The reference unrolls ds*rns singles, key-switch-internal.cpp:
        # 58-90 — restacking is the TPU-shaped restructuring.)
        def converted(j, qk):
            tj = t_target_intt[j]
            if moduli[j] > qk:
                tj = K.reduce_mod(tj, qk, qk, 1)
            return tj

        t_ops_for_i = {}  # i -> {j -> U64 in NTT form mod moduli at i}
        if rns_plan is not None and ds > 1:
            # All ds rows are built (vmap needs the full basis axis) even
            # if rns_modulus_size < ds leaves some unread — degenerate.
            stacked = stack_u64([
                stack_u64([converted(j, moduli[i])
                           for j in range(ds) if j != i])
                for i in range(ds)])
            fwd = fwd_ntt_rns(stacked, rns_plan, 4, 4)
            for i in range(min(rns_modulus_size, ds)):
                batch_js = [j for j in range(ds) if j != i]
                t_ops_for_i[i] = {
                    j: get(fwd, i, pos) for pos, j in enumerate(batch_js)}
        else:
            for i in range(min(rns_modulus_size, ds)):
                qk = moduli[i]
                t_ops_for_i[i] = {
                    j: jnp_ntt.fwd_ntt(converted(j, qk), plans[qk], 4, 4)
                    for j in range(ds) if j != i}
        if rns_modulus_size > ds:
            i = ds
            qk = moduli[key_modulus_size - 1]
            stacked = stack_u64([converted(j, qk) for j in range(ds)])
            fwd = jnp_ntt.fwd_ntt(stacked, plans[qk], 4, 4)
            t_ops_for_i[i] = {j: get(fwd, j) for j in range(ds)}

        # Key-product accumulation + flush, STACKED: one broadcasted
        # 128-bit multiply-accumulate over the (rns, ds, kc, n) block and
        # one Barrett-128 flush over (rns, kc, n) with per-row traced
        # moduli — the per-(i, k) singles are occupancy-starved at (n,)
        # (the same restacking the NTT groups already had; requires all
        # row moduli to share a bit length for the static Barrett shift,
        # else falls back to the per-(i, k) loop).
        kc = key_component_count
        key_idx = [key_modulus_size - 1 if i == decomp_modulus_size else i
                   for i in range(rns_modulus_size)]
        row_moduli = [moduli[ki] for ki in key_idx]
        t_poly_prod = [[None] * rns_modulus_size for _ in range(kc)]

        def row_ops(i):
            t_ops = dict(t_ops_for_i.get(i, {}))
            if i < decomp_modulus_size:
                t_ops[i] = get(t_target, i)  # original NTT form, < qi
            return [t_ops[j] for j in range(ds)]

        if (len(set(q.bit_length() for q in row_moduli)) == 1
                and rns_modulus_size > 1):
            t_stack = stack_u64([stack_u64(row_ops(i))
                                 for i in range(rns_modulus_size)])
            keys_rows = stack_u64([
                stack_u64([stack_u64([get(keys, j, k, key_idx[i])
                                      for k in range(kc)])
                           for j in range(ds)])
                for i in range(rns_modulus_size)])  # (rns, ds, kc, n)
            t_b = U64(t_stack.hi[:, :, None, :], t_stack.lo[:, :, None, :])
            prods = mul64_wide(t_b, keys_rows)      # U128 (rns, ds, kc, n)
            acc = U128(U64(prods.hi.hi[:, 0], prods.hi.lo[:, 0]),
                       U64(prods.lo.hi[:, 0], prods.lo.lo[:, 0]))
            for j in range(1, ds):
                acc = add128(acc, U128(
                    U64(prods.hi.hi[:, j], prods.hi.lo[:, j]),
                    U64(prods.lo.hi[:, j], prods.lo.lo[:, j])))
            flushed = _barrett_reduce_128_rows(acc, row_moduli)
            for i in range(rns_modulus_size):
                for k in range(kc):
                    t_poly_prod[k][i] = get(flushed, i, k)
        else:
            for i in range(rns_modulus_size):
                qk = row_moduli[i]
                t_ops = row_ops(i)
                acc = [U128(zeros64((n,)), zeros64((n,)))
                       for _ in range(kc)]
                for j in range(decomp_modulus_size):
                    for k in range(kc):
                        key_poly = get(keys, j, k, key_idx[i])
                        prod = mul64_wide(t_ops[j], key_poly)
                        acc[k] = add128(acc[k], prod)
                for k in range(kc):
                    t_poly_prod[k][i] = _barrett_reduce_128(acc[k], qk)

        # Mod-down: fold the key modulus component into each qi.
        qk = moduli[key_modulus_size - 1]
        qk_half = qk >> 1
        # The key-component inverse NTTs share modulus qk: one batched
        # (kc, n) transform instead of kc singles.
        t_last_stack = jnp_ntt.inv_ntt(
            stack_u64([t_poly_prod[k][decomp_modulus_size]
                       for k in range(key_component_count)]),
            plans[qk], 2, 2)
        q_barr = nt.barrett_factor(1, 64, qk)
        from ..limb import barrett_reduce_u64_approx as _br_approx
        _br = _br_approx if K._approx() else barrett_reduce_u64
        t_last_stack = _br(
            add64(t_last_stack, const64(qk_half)), qk, q_barr, 1)

        # The per-(k, i) forward NTTs differ in modulus along i only: one
        # stacked (ds, kc, n) RNS transform.
        def t_ntt_in(k, i):
            qi = moduli[i]
            t_last = get(t_last_stack, k)
            if qk > qi:
                t_ntt = K.reduce_mod(t_last, qi, qi, 1)
            else:
                t_ntt = t_last
            fix = qi - nt.barrett_reduce_64(
                qk_half, qi, nt.barrett_factor(1, 64, qi))
            return add64(t_ntt, const64(fix))  # in [0, 2qi)

        if rns_plan is not None:
            stacked = stack_u64([
                stack_u64([t_ntt_in(k, i)
                           for k in range(key_component_count)])
                for i in range(ds)])
            fwd_md = fwd_ntt_rns(stacked, rns_plan, 4, 4)

            def t_ntt_out(k, i):
                return get(fwd_md, i, k)
        else:
            singles = {
                (k, i): jnp_ntt.fwd_ntt(t_ntt_in(k, i), plans[moduli[i]],
                                        4, 4)
                for k in range(key_component_count) for i in range(ds)}

            def t_ntt_out(k, i):
                return singles[(k, i)]

        out_parts = []
        for k in range(key_component_count):
            comp = []
            for i in range(decomp_modulus_size):
                qi = moduli[i]
                # (ct mod qi) - (ct mod qk), lazily in [0, 8qi)
                t_ith = sub64(add64(t_poly_prod[k][i], const64(4 * qi)),
                              t_ntt_out(k, i))
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
    from .. import config as _config
    fn = _jitted_key_switch(n, decomp_modulus_size, key_modulus_size,
                            rns_modulus_size, key_component_count, moduli,
                            modswitch_factors, _config.trace_config())
    out = fn(r, t, k)
    return from_limbs(out) if host else out


# The jitted key-switch graphs hold NttPlan/RnsNttPlan references; flush
# them together with the plan cache so clear/rebuild cycles don't leak
# compiled functions + twiddle tables (same contract as ntt/__init__).
from ..ntt.plan import register_clear_hook as _register_clear_hook  # noqa: E402

_register_clear_hook(_jitted_key_switch.cache_clear)
