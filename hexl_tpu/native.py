"""ctypes bindings for the native host library (csrc/hexl_tpu_host.cpp).

Plan construction (twiddle tables, prime generation) is host-side and
O(N log q); the C++ library runs it at native speed. Falls back to the
pure-Python implementations transparently if the shared library has not
been built. Build with:  bash csrc/build.sh   (done automatically on first
import when a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SO_PATH = pathlib.Path(__file__).parent / "_hexl_tpu_host.so"
_SRC = pathlib.Path(__file__).parent.parent / "csrc" / "hexl_tpu_host.cpp"


def _try_build() -> bool:
    if not _SRC.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        from . import config
        if config._env_flag("HEXL_TPU_DISABLE_NATIVE"):
            _LIB = False
            return _LIB
        if not _SO_PATH.exists() and not _try_build():
            _LIB = False
            return _LIB
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            _LIB = False
            return _LIB
        u64 = ctypes.c_uint64
        p64 = ctypes.POINTER(ctypes.c_uint64)
        lib.ht_is_prime.restype = ctypes.c_int
        lib.ht_is_prime.argtypes = [u64]
        lib.ht_generate_primes.restype = ctypes.c_int64
        lib.ht_generate_primes.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_int, u64, p64]
        lib.ht_minimal_primitive_root.restype = u64
        lib.ht_minimal_primitive_root.argtypes = [u64, u64]
        lib.ht_inverse_mod.restype = u64
        lib.ht_inverse_mod.argtypes = [u64, u64]
        lib.ht_root_tables.restype = ctypes.c_int
        lib.ht_root_tables.argtypes = [u64, u64, u64, p64, p64, p64, p64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return bool(_load())


def is_prime(n: int):
    lib = _load()
    if not lib or n >= (1 << 64):
        return None
    return bool(lib.ht_is_prime(n))


def generate_primes(num: int, bit_size: int, prefer_small: bool,
                    ntt_size: int):
    lib = _load()
    if not lib or bit_size >= 63:
        return None
    out = np.zeros(num, dtype=np.uint64)
    found = lib.ht_generate_primes(
        num, bit_size, int(prefer_small), ntt_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    if found < num:
        return None
    return [int(x) for x in out]


def minimal_primitive_root(degree: int, modulus: int):
    lib = _load()
    if not lib:
        return None
    r = int(lib.ht_minimal_primitive_root(degree, modulus))
    return r if r != 0 else None


def root_tables(n: int, modulus: int, root: int):
    """Returns (rop, irop, prop, pirop) numpy uint64 arrays, or None."""
    lib = _load()
    if not lib:
        return None
    rop = np.zeros(n, dtype=np.uint64)
    irop = np.zeros(n, dtype=np.uint64)
    prop = np.zeros(n, dtype=np.uint64)
    pirop = np.zeros(n, dtype=np.uint64)
    as_p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    lib.ht_root_tables(n, modulus, root, as_p(rop), as_p(irop), as_p(prop),
                       as_p(pirop))
    return rop, irop, prop, pirop
