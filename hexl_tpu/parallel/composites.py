"""Mesh-sharded composite pipelines: key-switch and dyadic multiply.

The reference's production composites are single-socket loops
(hexl/experimental/seal/key-switch-internal.cpp:25-201,
dyadic-multiply-internal.cpp:199-256). On a TPU slice the two natural
parallel axes are:

  * the polynomial coefficient axis — sharded over the mesh's 'coeff'
    axis; all NTTs run through DistNTT (two ICI all-to-alls per
    transform), and every element-wise segment between transforms is
    shard-local (XLA propagates the NamedSharding, no communication);
  * independent ciphertexts — the caller's 'batch' axis (replicate the
    composite over 'batch' via vmap/stacking at the call site; the
    modulus-count axes inside one key switch are small and odd-sized,
    so they stay replicated, batch_shard=False).

Numerical contract: identical lazy-range chaining to the single-chip
composites (experimental/key_switch.py, experimental/dyadic.py) and the
reference; outputs are bit-equal to the single-chip path on the same
inputs (asserted on the emulated 8-device mesh in tests/test_dist_ntt.py
and by the driver dryrun).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .. import nt
from ..eltwise import jnp_kernels as K
from ..limb import (U64, U128, add64, add128, barrett_reduce_u64, coerce_limbs,
                    const64, from_limbs, mul64_wide, sub64, zeros64)
from ..experimental.key_switch import _barrett_reduce_128
from .dist_ntt import get_dist_ntt


def _shard(x: U64, mesh: Mesh, spec: P) -> U64:
    sh = NamedSharding(mesh, spec)
    return U64(jax.device_put(x.hi, sh), jax.device_put(x.lo, sh))


def dist_dyadic_multiply(operand1, operand2, moduli, mesh: Mesh):
    """Coefficient-sharded ct x ct dyadic multiply over an RNS basis.

    operand1/2: (2, num_moduli, n); output (3, num_moduli, n). Pure
    element-wise work — placing the inputs with the coefficient axis
    sharded over 'coeff' (and the modulus axis over 'batch' when it
    divides) makes every product shard-local; there is no communication.
    """
    from ..experimental import dyadic as _dy
    from .. import config as _config

    moduli = tuple(int(q) for q in moduli)
    x, x_host = coerce_limbs(operand1)
    y, y_host = coerce_limbs(operand2)
    host = x_host or y_host
    m = len(moduli)
    dp = mesh.shape.get("batch", 1)
    mod_axis = "batch" if (dp > 1 and m % dp == 0) else None
    spec = P(None, mod_axis, "coeff")
    x = _shard(x, mesh, spec)
    y = _shard(y, mesh, spec)
    out = _dy._jitted(moduli, _config.trace_config())(x, y)
    return from_limbs(out) if host else out


def dist_key_switch(result, t_target, n: int, decomp_modulus_size: int,
                    key_modulus_size: int, rns_modulus_size: int,
                    key_component_count: int, moduli: Sequence[int],
                    key_switch_keys, modswitch_factors: Sequence[int],
                    mesh: Mesh):
    """CKKS key switch with the coefficient axis sharded over `mesh`.

    Same signature and semantics as experimental.key_switch.key_switch
    (reference stack: key-switch-internal.cpp:25-201) with every NTT
    routed through the sharded DistNTT engine and the element-wise
    segments (RNS base conversion, 128-bit lazy accumulation, Barrett-128
    flush, +qk/2 mod-down, FMA accumulate) running shard-local on the
    'coeff'-sharded arrays. Bit-equal to the single-chip composite.
    """
    moduli = tuple(int(q) for q in moduli)
    msf = tuple(int(f) for f in modswitch_factors)
    ds, kms, rns, kc = (decomp_modulus_size, key_modulus_size,
                        rns_modulus_size, key_component_count)

    r_l, r_host = coerce_limbs(result)
    t_l, t_host = coerce_limbs(t_target)
    k_l, _ = coerce_limbs(key_switch_keys)
    host = r_host or t_host

    dntt = {q: get_dist_ntt(n, q, mesh) for q in set(moduli)}
    cspec1 = P("coeff")

    def get(u, *idx):
        return U64(u.hi[idx], u.lo[idx])

    t_l = _shard(t_l, mesh, P(None, "coeff"))
    k_l = _shard(k_l, mesh, P(None, None, None, "coeff"))
    r_l = _shard(r_l, mesh, P(None, None, "coeff"))

    # Inverse NTT of the target per decomposition modulus: (2, 1).
    t_target_intt = [
        dntt[moduli[j]].inverse(get(t_l, j), 2, 1) for j in range(ds)]

    def converted(j, qk):
        tj = t_target_intt[j]
        if moduli[j] > qk:
            tj = K.reduce_mod(tj, qk, qk, 1)
        return tj

    # Lazy forward NTTs of the base-converted targets: (4, 4).
    t_ops_for_i = {}
    for i in range(min(rns, ds)):
        qk = moduli[i]
        t_ops_for_i[i] = {
            j: dntt[qk].forward(converted(j, qk), 4, 4)
            for j in range(ds) if j != i}
    if rns > ds:
        qk = moduli[kms - 1]
        t_ops_for_i[ds] = {
            j: dntt[qk].forward(converted(j, qk), 4, 4) for j in range(ds)}

    # 128-bit lazy key-product accumulation + Barrett-128 flush, all
    # element-wise on 'coeff'-sharded arrays (one jit per i).
    def acc_flush(t_ops_stack, keys_stack, qk):
        def fn(t_hi, t_lo, k_hi, k_lo):
            acc = [U128(zeros64((n,)), zeros64((n,))) for _ in range(kc)]
            for j in range(ds):
                for k in range(kc):
                    prod = mul64_wide(U64(t_hi[j], t_lo[j]),
                                      U64(k_hi[j, k], k_lo[j, k]))
                    acc[k] = add128(acc[k], prod)
            outs = [_barrett_reduce_128(acc[k], qk) for k in range(kc)]
            return (jnp.stack([o.hi for o in outs]),
                    jnp.stack([o.lo for o in outs]))

        hi, lo = jax.jit(fn)(t_ops_stack.hi, t_ops_stack.lo,
                             keys_stack.hi, keys_stack.lo)
        return U64(hi, lo)

    t_poly_prod = [[None] * rns for _ in range(kc)]
    for i in range(rns):
        key_index = kms - 1 if i == ds else i
        qk = moduli[key_index]
        t_ops = dict(t_ops_for_i.get(i, {}))
        if i < ds:
            t_ops[i] = get(t_l, i)
        t_stack = U64(jnp.stack([t_ops[j].hi for j in range(ds)]),
                      jnp.stack([t_ops[j].lo for j in range(ds)]))
        keys_stack = U64(k_l.hi[:, :, key_index], k_l.lo[:, :, key_index])
        flushed = acc_flush(t_stack, keys_stack, qk)
        for k in range(kc):
            t_poly_prod[k][i] = get(flushed, k)

    # Mod-down: fold the key-modulus component into each qi.
    qk = moduli[kms - 1]
    qk_half = qk >> 1
    t_last = [dntt[qk].inverse(t_poly_prod[k][ds], 2, 2) for k in range(kc)]
    q_barr = nt.barrett_factor(1, 64, qk)
    from ..limb import barrett_reduce_u64_approx as _br_approx
    _br = _br_approx if K._approx() else barrett_reduce_u64

    def half_round(v):
        return _br(add64(v, const64(qk_half)), qk, q_barr, 1)

    t_last = [jax.jit(half_round)(v) for v in t_last]

    out_parts = []
    for k in range(kc):
        comp = []
        for i in range(ds):
            qi = moduli[i]
            if qk > qi:
                t_in = K.reduce_mod(t_last[k], qi, qi, 1)
            else:
                t_in = t_last[k]
            fix = qi - nt.barrett_reduce_64(
                qk_half, qi, nt.barrett_factor(1, 64, qi))
            t_in = jax.jit(lambda v, f=fix: add64(v, const64(f)))(t_in)
            t_ntt = dntt[qi].forward(t_in, 4, 4)

            def tail(prod, tn, racc, qi=qi, f=msf[i]):
                t_ith = sub64(add64(prod, const64(4 * qi)), tn)
                t_ith = K.fma_mod(t_ith, f, None, qi, 8)
                return K.add_mod(racc, t_ith, qi)

            comp.append(jax.jit(tail)(t_poly_prod[k][i], t_ntt,
                                      get(r_l, k, i)))
        out_parts.append(comp)

    hi = jnp.stack([jnp.stack([p.hi for p in comp]) for comp in out_parts])
    lo = jnp.stack([jnp.stack([p.lo for p in comp]) for comp in out_parts])
    out = U64(hi, lo)
    return from_limbs(out) if host else out
