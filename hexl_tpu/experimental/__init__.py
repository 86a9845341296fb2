"""Composite / experimental ops (parity with the reference's experimental
layer: SEAL shims, FFT-like, misc)."""

from .dyadic import dyadic_multiply
from .fft_like import FFTLike
from .key_switch import key_switch
from .lr_mat_vec import lr_mat_vec_mult

__all__ = ["dyadic_multiply", "key_switch", "FFTLike", "lr_mat_vec_mult"]
