"""Dyadic (ciphertext x ciphertext) multiply over an RNS basis.

BFV/CKKS ct-ct product in NTT form: inputs are 2-polynomial ciphertexts per
modulus; output has 3 polynomials per modulus:
  (x0*y0, x0*y1 + x1*y0, x1*y1)    (all pointwise mod q_i)
Behavioral parity with the reference's SEAL shim
(hexl/experimental/seal/dyadic-multiply-internal.cpp:199-256); the
reference's 512-element cache tiling is replaced by XLA/Pallas tiling — the
whole (num_moduli, n) plane is one batched kernel launch per modulus.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..eltwise import jnp_kernels as K
from ..limb import U64, from_limbs, to_limbs


def _const_vec(vals) -> U64:
    """int list -> (G, 1) U64 broadcasting against (G, n) planes."""
    return to_limbs(np.asarray(vals, dtype=np.uint64)[:, None])


@functools.lru_cache(maxsize=None)
def _jitted(moduli: tuple, _cfg=None):
    # _cfg = config.trace_config(): the Barrett bodies read the
    # approx-mulhi switch at trace time, so env toggles must retrace.
    #
    # The modulus axis is STACKED, not unrolled: the generalized-Barrett
    # shift is static per modulus bit width, so every same-width modulus
    # group runs as one (G, n) kernel with the per-modulus constants
    # (q, 2q, mu) as broadcast (G, 1) operands. Measured on v5e at the
    # production shape (n=2^14, four 50-bit primes): 87.1 -> 26.7
    # us/call over the unrolled per-modulus form, bit-identical.
    import jax.numpy as jnp

    from ..limb import add_mod_traced, mult_mod_barrett_traced

    for q in moduli:
        if not (2 < q < (1 << 62)):
            raise ValueError("moduli must be in (2, 2^62)")
    approx = K._approx()
    groups = {}  # n_bits -> list of original positions
    for i, q in enumerate(moduli):
        groups.setdefault(q.bit_length(), []).append(i)
    order = [i for bits in sorted(groups) for i in groups[bits]]
    inv_perm = tuple(np.argsort(order))  # scatter back to input order
    consts = [(bits, tuple(groups[bits]),
               _const_vec([moduli[i] for i in groups[bits]]),
               _const_vec([2 * moduli[i] for i in groups[bits]]),
               _const_vec([(1 << (bits + 62)) // moduli[i]
                           for i in groups[bits]]))
              for bits in sorted(groups)]

    def fn(x: U64, y: U64):
        # x, y: (2, M, n) -> (3, M, n).
        outs = []  # per group: (3-tuple of U64 (G, n))
        for bits, idx, qv, tqv, muv in consts:
            shift = bits - 2
            sel = list(idx)

            def pick(u, p, sel=sel):
                return U64(u.hi[p, sel], u.lo[p, sel])

            x0, x1 = pick(x, 0), pick(x, 1)
            y0, y1 = pick(y, 0), pick(y, 1)

            def mm(a, b, qv=qv, tqv=tqv, muv=muv, shift=shift):
                return mult_mod_barrett_traced(a, b, qv, tqv, muv,
                                               shift, approx)

            o0 = mm(x0, y0)
            o1 = add_mod_traced(mm(x0, y1), mm(x1, y0), qv)
            o2 = mm(x1, y1)
            outs.append((o0, o1, o2))

        def cat(k, plane):
            parts = [getattr(o[k], plane) for o in outs]
            joined = jnp.concatenate(parts, axis=0)
            return jnp.take(joined, jnp.asarray(inv_perm), axis=0)

        return U64(jnp.stack([cat(0, "hi"), cat(1, "hi"), cat(2, "hi")]),
                   jnp.stack([cat(0, "lo"), cat(1, "lo"), cat(2, "lo")]))

    return jax.jit(fn)


def dyadic_multiply(operand1, operand2, moduli):
    """ct x ct product. Operands shaped (2, num_moduli, n), output
    (3, num_moduli, n); values < q_i along the moduli axis."""
    moduli = tuple(int(q) for q in moduli)
    from ..limb import coerce_limbs
    x, x_host = coerce_limbs(operand1)
    y, y_host = coerce_limbs(operand2)
    from .. import config as _config
    out = _jitted(moduli, _config.trace_config())(x, y)
    return from_limbs(out) if (x_host or y_host) else out


# Flushed with the plan cache (clear/rebuild cycles must not leak jitted
# graphs; same contract as ntt/__init__).
from ..ntt.plan import register_clear_hook as _register_clear_hook  # noqa: E402

_register_clear_hook(_jitted.cache_clear)
