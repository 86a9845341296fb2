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


@functools.lru_cache(maxsize=None)
def _jitted(moduli: tuple, _cfg=None):
    # _cfg = config.trace_config(): the eltwise bodies read the
    # approx-mulhi switch at trace time, so env toggles must retrace.
    def fn(x: U64, y: U64):
        # x, y: (2, M, n); per-modulus static constants -> unrolled loop.
        outs0, outs1, outs2 = [], [], []
        for i, q in enumerate(moduli):
            x0 = U64(x.hi[0, i], x.lo[0, i])
            x1 = U64(x.hi[1, i], x.lo[1, i])
            y0 = U64(y.hi[0, i], y.lo[0, i])
            y1 = U64(y.hi[1, i], y.lo[1, i])
            outs0.append(K.mult_mod(x0, y0, q))
            cross = K.add_mod(K.mult_mod(x0, y1, q),
                              K.mult_mod(x1, y0, q), q)
            outs1.append(cross)
            outs2.append(K.mult_mod(x1, y1, q))

        import jax.numpy as jnp

        def stack(us):
            return U64(jnp.stack([u.hi for u in us]),
                       jnp.stack([u.lo for u in us]))

        o0, o1, o2 = stack(outs0), stack(outs1), stack(outs2)
        return U64(jnp.stack([o0.hi, o1.hi, o2.hi]),
                   jnp.stack([o0.lo, o1.lo, o2.lo]))

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
