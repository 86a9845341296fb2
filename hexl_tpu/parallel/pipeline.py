"""Stage-pipelined NTT over a device ring — the PP analogue (SURVEY §2.5).

Pipeline parallelism splits the OPERATION (not the data) across devices:
device d owns a contiguous run of the transform's log2(N) butterfly
stages (and only that run's twiddle tables), and microbatches of
polynomials stream through the ring with `lax.ppermute`. At tick t,
device d applies its stage run to microbatch t-d; with M microbatches
and D devices the pipeline reaches M/(M+D-1) utilization — the GPipe
schedule expressed as one SPMD `jax.shard_map` program.

This complements the library's other scale-out shapes:
  * DP      — batch axis sharding (parallel/dist_ntt.py make_mesh)
  * TP/CP   — coefficient-sharded transform (parallel/dist_ntt.DistNTT)
  * EP      — per-prime RNS dispersion (parallel/dist_ntt.dist_rns_poly_mult)
  * PP      — this module: stage runs across a ring, microbatches in flight
The reference library has no multi-node story at all (SURVEY §5); these
are the TPU-native decompositions of its single-box parallel loops.

The per-device stage math is the 1-D staged radix-2 body (the same
butterflies as hexl_tpu.ntt.jnp_ntt), because every stage of that form
maps (batch, N) -> (batch, N): a uniform carry shape at each pipeline
boundary, which `lax.switch`/`ppermute` require. The 2D tiled body
trades shapes mid-transform, so this module favors schedule clarity over
single-chip kernel peak — use DistNTT when raw per-transform latency
matters; use the pipeline when the working set of a full transform (or
its twiddle tables, at large N) should not live on one chip.

Behavioral reference for the transform itself: ReferenceForwardTransform
ToBitReverse / ReferenceInverseTransformFromBitReverse
(/root/reference/hexl/ntt/ntt-internal.cpp:184-236).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from .. import config
from ..limb import (U64, coerce_limbs, cond_sub64, const64, from_limbs,
                    reduce_mod_lazy64)
from ..ntt.jnp_ntt import (LEAN_APPROX_MAX_Q, _bflys, _final_inv_stage,
                           _split2)
from ..ntt.plan import get_plan


def _partition(k: int, d: int):
    """Split k stages into d contiguous runs, sizes differing by <= 1
    (front-loaded, like GPipe layer assignment)."""
    base, extra = divmod(k, d)
    sizes = [base + (1 if i < extra else 0) for i in range(d)]
    bounds = np.cumsum([0] + sizes)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(d)]


class PipelineNTT:
    """Forward/inverse NTT with butterfly stages pipelined over a mesh
    axis. Microbatches (leading axis of the input) flow through the
    device ring; each device applies only its own stage run."""

    def __init__(self, degree: int, modulus: int, mesh: Mesh,
                 axis: str = "pp"):
        self.n = degree
        self.q = modulus
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        self.plan = get_plan(degree, modulus)
        self.stages = degree.bit_length() - 1
        if self.stages < self.d:
            raise ValueError(
                f"degree 2^{self.stages} has fewer stages than pipeline "
                f"devices ({self.d})")
        self._cache = {}

    # -- per-stage closures ----------------------------------------------

    def _fwd_stage(self, k: int):
        """Forward stage k (m = 2^k): one radix-2 level on (..., N)."""
        plan = self.plan
        m = 1 << k
        t = self.n // (2 * m)

        def run(x: U64, q, two_q) -> U64:
            fwd_bfly, _ = _bflys(self.q < LEAN_APPROX_MAX_Q)
            xs, ys, join = _split2(x, x.lo.ndim - 1, m, t)
            w = U64(plan.rop_dev.hi[m:2 * m, None],
                    plan.rop_dev.lo[m:2 * m, None])
            wp = U64(plan.prop_dev.hi[m:2 * m, None],
                     plan.prop_dev.lo[m:2 * m, None])
            nx, ny = fwd_bfly(xs, ys, w, wp, q, two_q)
            return join(nx, ny)

        return run

    def _inv_stage(self, k: int):
        """Inverse stage k (t = 2^k); the last stage (k = log2(N)-1) is
        fused with N^{-1} exactly like the single-chip body."""
        plan = self.plan
        n = self.n
        t = 1 << k
        m = n // (2 * t)
        # root_index after consuming stages 0..k-1: 1 + sum(n/(2*2^j)).
        root_index = 1 + sum(n // (2 << j) for j in range(k))

        def run(x: U64, q, two_q) -> U64:
            _, inv_bfly = _bflys(self.q < LEAN_APPROX_MAX_Q)
            axis = x.lo.ndim - 1
            xs, ys, join = _split2(x, axis, m, t)
            if m == 1:
                nx, ny = _final_inv_stage(xs, ys, plan, q, two_q)
                return join(nx, ny)
            w = U64(plan.irop_dev.hi[root_index:root_index + m, None],
                    plan.irop_dev.lo[root_index:root_index + m, None])
            wp = U64(plan.pirop_dev.hi[root_index:root_index + m, None],
                     plan.pirop_dev.lo[root_index:root_index + m, None])
            nx, ny = inv_bfly(xs, ys, w, wp, q, two_q)
            return join(nx, ny)

        return run

    def _runs(self, forward: bool, omf: int):
        """D branch functions, each applying one device's stage run.
        Branch signatures are uniform ((hi, lo) -> (hi, lo)), as
        lax.switch requires."""
        mk = self._fwd_stage if forward else self._inv_stage
        parts = _partition(self.stages, self.d)
        q = const64(self.q)
        two_q = const64(2 * self.q)
        q_i = self.q

        def make(lo_s: int, hi_s: int, last: bool):
            def branch(hi, lo):
                x = U64(hi, lo)
                for k in range(lo_s, hi_s):
                    x = mk(k)(x, q, two_q)
                if last:
                    if forward and omf == 1:
                        x = reduce_mod_lazy64(x, q_i, 4)
                    if not forward and omf == 1:
                        x = cond_sub64(x, q)
                return x.hi, x.lo
            return branch

        return [make(lo_s, hi_s, i == self.d - 1)
                for i, (lo_s, hi_s) in enumerate(parts)]

    # -- the pipeline schedule -------------------------------------------

    def _build(self, forward: bool, omf: int, mshape):
        d_count = self.d
        axis = self.axis
        runs = self._runs(forward, omf)
        m_count = mshape[0]
        ring = [(i, (i + 1) % d_count) for i in range(d_count)]

        def body(xq_hi, xq_lo):
            d = jax.lax.axis_index(axis)
            buf_hi = jnp.zeros(xq_hi.shape[1:], jnp.uint32)
            buf_lo = jnp.zeros_like(buf_hi)

            def tick(carry, t):
                buf_hi, buf_lo, out_hi, out_lo = carry
                # Device 0 injects microbatch t.
                take = jnp.clip(t, 0, m_count - 1)
                inj = (d == 0) & (t < m_count)
                ih = jax.lax.dynamic_index_in_dim(xq_hi, take, 0, False)
                il = jax.lax.dynamic_index_in_dim(xq_lo, take, 0, False)
                bh = jnp.where(inj, ih, buf_hi)
                bl = jnp.where(inj, il, buf_lo)
                # Apply this device's stage run.
                bh, bl = jax.lax.switch(d, runs, bh, bl)
                # Device D-1 banks finished microbatch t-(D-1).
                widx = t - (d_count - 1)
                wtake = jnp.clip(widx, 0, m_count - 1)
                wr = (d == d_count - 1) & (widx >= 0)
                oh = jax.lax.dynamic_index_in_dim(out_hi, wtake, 0, False)
                ol = jax.lax.dynamic_index_in_dim(out_lo, wtake, 0, False)
                out_hi = jax.lax.dynamic_update_index_in_dim(
                    out_hi, jnp.where(wr, bh, oh), wtake, 0)
                out_lo = jax.lax.dynamic_update_index_in_dim(
                    out_lo, jnp.where(wr, bl, ol), wtake, 0)
                # Advance the ring.
                bh = jax.lax.ppermute(bh, axis, ring)
                bl = jax.lax.ppermute(bl, axis, ring)
                return (bh, bl, out_hi, out_lo), None

            out_hi = jnp.zeros_like(xq_hi)
            out_lo = jnp.zeros_like(xq_lo)
            ticks = jnp.arange(m_count + d_count - 1)
            (buf_hi, buf_lo, out_hi, out_lo), _ = jax.lax.scan(
                tick, (buf_hi, buf_lo, out_hi, out_lo), ticks)
            # Only the last device holds real outputs; broadcast them.
            keep = (d == d_count - 1).astype(jnp.uint32)
            out_hi = jax.lax.psum(out_hi * keep, axis)
            out_lo = jax.lax.psum(out_lo * keep, axis)
            return out_hi, out_lo

        spec = P(*([None] * len(mshape)))
        fn = jax.shard_map(body, mesh=self.mesh,
                           in_specs=(spec, spec), out_specs=(spec, spec),
                           check_vma=False)
        return jax.jit(fn)

    def _apply(self, x, forward: bool, imf: int, omf: int):
        xl, was_host = coerce_limbs(x)
        if xl.lo.ndim < 2 or xl.lo.shape[-1] != self.n:
            raise ValueError(
                "pipeline input must be (microbatch, ..., N)")
        key = (forward, omf, xl.lo.shape, config.trace_config())
        if key not in self._cache:
            self._cache[key] = self._build(forward, omf, xl.lo.shape)
        hi, lo = self._cache[key](xl.hi, xl.lo)
        out = U64(hi, lo)
        return from_limbs(out) if was_host else out

    def forward(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1):
        """Forward NTT of (M, ..., N) microbatches through the pipeline.
        Input < IMF*q (IMF in {1,2,4}); OMF in {1,4}."""
        if input_mod_factor not in (1, 2, 4):
            raise ValueError("input_mod_factor must be 1, 2 or 4")
        if output_mod_factor not in (1, 4):
            raise ValueError("output_mod_factor must be 1 or 4")
        return self._apply(x, True, input_mod_factor, output_mod_factor)

    def inverse(self, x, input_mod_factor: int = 1,
                output_mod_factor: int = 1):
        """Inverse NTT of (M, ..., N) microbatches through the pipeline.
        Input < IMF*q (IMF in {1,2}); OMF in {1,2}."""
        if input_mod_factor not in (1, 2):
            raise ValueError("input_mod_factor must be 1 or 2")
        if output_mod_factor not in (1, 2):
            raise ValueError("output_mod_factor must be 1 or 2")
        return self._apply(x, False, input_mod_factor, output_mod_factor)


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-axis ('pp',) mesh over the first n_stages devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices[:n_stages]), ("pp",))
