"""Encrypted linear-regression matrix-vector multiply.

Per-weight dyadic (ct x ct) multiply followed by an O(log n) adder-tree
accumulation of the resulting ciphertexts. Behavioral parity with the
reference (hexl/experimental/misc/lr-mat-vec-mult.cpp:172-293); on TPU the
adder tree is a tree of batched add-mod kernels over the weights axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..eltwise import jnp_kernels as K
from ..limb import U64, from_limbs, to_limbs


@functools.lru_cache(maxsize=None)
def _jitted(moduli: tuple, num_weights: int, _cfg=None):
    # _cfg = config.trace_config(): the eltwise bodies read the
    # approx-mulhi switch at trace time, so env toggles must retrace.
    def fn(cipher1: U64, cipher2: U64):
        # cipher1/2: (num_weights, 2, M, n) NTT-form ciphertext pairs.
        # Dyadic product per weight -> (num_weights, 3, M, n).
        def get(u, *idx):
            return U64(u.hi[idx], u.lo[idx])

        prods = []
        for w in range(num_weights):
            per_m = []
            for i, q in enumerate(moduli):
                x0, x1 = get(cipher1, w, 0, i), get(cipher1, w, 1, i)
                y0, y1 = get(cipher2, w, 0, i), get(cipher2, w, 1, i)
                p0 = K.mult_mod(x0, y0, q)
                p1 = K.add_mod(K.mult_mod(x0, y1, q),
                               K.mult_mod(x1, y0, q), q)
                p2 = K.mult_mod(x1, y1, q)
                per_m.append((p0, p1, p2))
            prods.append(per_m)

        # Adder tree over weights.
        dist = 1
        while dist < num_weights:
            for s in range(0, num_weights, 2 * dist):
                if s + dist >= num_weights:
                    continue
                left, right = prods[s], prods[s + dist]
                prods[s] = [
                    tuple(K.add_mod(l, r, moduli[i])
                          for l, r in zip(left[i], right[i]))
                    for i in range(len(moduli))
                ]
            dist *= 2

        acc = prods[0]
        hi = jnp.stack([jnp.stack([acc[i][p].hi for i in
                                   range(len(moduli))]) for p in range(3)])
        lo = jnp.stack([jnp.stack([acc[i][p].lo for i in
                                   range(len(moduli))]) for p in range(3)])
        return U64(hi, lo)

    return jax.jit(fn)


def lr_mat_vec_mult(cipher1, cipher2, moduli):
    """result = sum_w cipher1[w] (x) cipher2[w] (dyadic, mod-q pointwise).

    cipher1, cipher2: (num_weights, 2, num_moduli, n) NTT-form;
    returns (3, num_moduli, n).
    """
    moduli = tuple(int(q) for q in moduli)
    from ..limb import coerce_limbs
    c1, c1_host = coerce_limbs(cipher1)
    c2, c2_host = coerce_limbs(cipher2)
    num_weights = c1.lo.shape[0]
    from .. import config as _config
    out = _jitted(moduli, num_weights, _config.trace_config())(c1, c2)
    return from_limbs(out) if (c1_host or c2_host) else out


# Flushed with the plan cache (same contract as ntt/__init__).
from ..ntt.plan import register_clear_hook as _register_clear_hook  # noqa: E402

_register_clear_hook(_jitted.cache_clear)
