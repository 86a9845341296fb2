"""Pipeline-parallel (PP) NTT tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from hexl_tpu import nt, ref
from hexl_tpu.parallel import PipelineNTT, make_pipeline_mesh
from hexl_tpu.parallel.pipeline import _partition


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_partition_contiguous_and_balanced():
    parts = _partition(12, 8)
    assert parts[0] == (0, 2)
    assert parts[-1] == (11, 12)
    assert [hi - lo for lo, hi in parts] == [2, 2, 2, 2, 1, 1, 1, 1]
    # Exact cover, in order.
    flat = [s for lo, hi in parts for s in range(lo, hi)]
    assert flat == list(range(12))


@pytest.mark.parametrize("d", [2, 8])
def test_pipeline_forward_matches_oracle(d):
    _require_devices(d)
    n = 1 << 12
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    pntt = PipelineNTT(n, q, make_pipeline_mesh(d))
    rng = np.random.default_rng(d)
    x = rng.integers(0, q, size=(5, 2, n), dtype=np.uint64)  # M=5, B=2
    got = pntt.forward(x, 1, 1)
    exp = ref.fwd_ntt_radix2(x.reshape(-1, n), q, pntt.plan.rop,
                             pntt.plan.prop, 1, 1).reshape(x.shape)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_pipeline_roundtrip_and_lazy():
    _require_devices(8)
    n = 1 << 12
    q = nt.generate_primes(1, 60, True, ntt_size=n)[0]
    pntt = PipelineNTT(n, q, make_pipeline_mesh(8))
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    y = pntt.forward(x, 1, 4)
    assert np.all(np.asarray(y) < 4 * q)
    back = pntt.inverse(np.asarray(y) % q, 1, 1)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_pipeline_single_microbatch():
    _require_devices(8)
    n = 1 << 11
    q = nt.generate_primes(1, 50, True, ntt_size=n)[0]
    pntt = PipelineNTT(n, q, make_pipeline_mesh(8))
    rng = np.random.default_rng(7)
    x = rng.integers(0, q, size=(1, n), dtype=np.uint64)
    got = pntt.forward(x, 1, 1)
    exp = ref.fwd_ntt_radix2(x, q, pntt.plan.rop, pntt.plan.prop, 1, 1)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_pipeline_rejects_too_few_stages():
    _require_devices(8)
    q = nt.generate_primes(1, 50, True, ntt_size=64)[0]
    with pytest.raises(ValueError, match="fewer stages"):
        PipelineNTT(64, q, make_pipeline_mesh(8))
