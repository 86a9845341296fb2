"""hexl_tpu — a TPU-native modular-arithmetic kernel library for HE.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Intel HEXL
(negacyclic NTT over Z_q[X]/(X^N+1) plus element-wise modular vector ops for
word-sized primes up to ~62 bits), built TPU-first: 2x32-bit limb arithmetic
on the VPU/MXU in place of AVX-512, and pod-slice sharding over ICI in place
of single-socket SIMD.
"""

from . import nt, ref
from .prewarm import prewarm

__version__ = "0.1.0"
