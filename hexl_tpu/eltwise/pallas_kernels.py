"""Pallas TPU element-wise kernels.

A single generic runner tiles flat u64 (limb-pair) vectors into
(block_rows, 128) VMEM blocks and applies a limb-arithmetic body per block.
The bodies are the *same* jnp functions as the XLA fallback path
(hexl_tpu.eltwise.jnp_kernels) — only the execution strategy differs: here
each block's hi/lo limbs are resident in VMEM and the whole op chain for a
block runs register-to-register on the VPU, with the grid pipelining
HBM<->VMEM DMAs. This is the dispatch role AVX-512 plays in the reference
(hexl/eltwise/*-avx512.cpp), re-expressed for the (8,128) vector tile.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..limb import U64

LANES = 128
DEFAULT_BLOCK_ROWS = 512  # 512x128 u32 = 256 KiB per limb plane


def _flatten_pad(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    flat = x.reshape(-1)
    total = rows * LANES
    if flat.shape[0] < total:
        flat = jnp.pad(flat, (0, total - flat.shape[0]))
    return flat.reshape(rows, LANES)


def run_eltwise(fn: Callable[..., U64], ins: Sequence[U64],
                block_rows: int = DEFAULT_BLOCK_ROWS) -> U64:
    """Apply `fn` (U64-in, U64-out, elementwise) over tiled VMEM blocks."""
    shape = ins[0].lo.shape
    n = math.prod(shape) if shape else 1
    rows = max(8, -(-n // LANES))
    # Round rows to a multiple of 8 (sublane tile) and cap the block size.
    rows = -(-rows // 8) * 8
    block = min(block_rows, rows)
    # Grid must cover rows exactly; round rows up to a block multiple.
    rows = -(-rows // block) * block
    grid = rows // block

    planes = []
    for u in ins:
        planes.append(_flatten_pad(u.hi, rows))
        planes.append(_flatten_pad(u.lo, rows))

    def kernel(*refs):
        n_in = len(ins)
        vals = [U64(refs[2 * i][...], refs[2 * i + 1][...])
                for i in range(n_in)]
        out = fn(*vals)
        refs[2 * n_in][...] = out.hi
        refs[2 * n_in + 1][...] = out.lo

    spec = pl.BlockSpec((block, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec] * len(planes),
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
        ),
    )(*planes)
    hi = out_hi.reshape(-1)[:n].reshape(shape)
    lo = out_lo.reshape(-1)[:n].reshape(shape)
    return U64(hi, lo)
