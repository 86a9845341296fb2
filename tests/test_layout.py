"""Direct unit tests for the NTT layout helpers.

Reference pattern: the reference pins every SIMD interleave helper with
exact permutation tests (test/test-ntt-avx512.cpp:23-150). Here the
layout machinery is phase_b_table / _transpose_tiles / _untranspose_tiles
/ build_stage_lists; these tests localize regressions to the helper
instead of a whole-transform mismatch.
"""

import numpy as np

from hexl_tpu.limb import U64, from_limbs, to_limbs
from hexl_tpu.ntt.jnp_ntt import _transpose_tiles, _untranspose_tiles
from hexl_tpu.ntt.plan import LANES, build_stage_lists, phase_b_table


def test_transpose_tiles_permutation():
    # (R, 128) -> (tiles, 128, L): element (tile*L + r, c) must land at
    # [tile, c, r].
    rows, lane_l = 32, 32
    tiles = rows // lane_l
    n = rows * LANES
    x = np.arange(n, dtype=np.uint64).reshape(rows, LANES)
    t = _transpose_tiles(to_limbs(x), tiles, lane_l)
    got = from_limbs(t)
    assert got.shape == (tiles, LANES, lane_l)
    for tile in range(tiles):
        for r in range(0, lane_l, 7):
            for c in range(0, LANES, 31):
                assert got[tile, c, r] == x[tile * lane_l + r, c]


def test_untranspose_roundtrip():
    rows, lane_l = 128, 128
    tiles = rows // lane_l
    x = np.arange(rows * LANES, dtype=np.uint64).reshape(rows, LANES)
    t = _transpose_tiles(to_limbs(x), tiles, lane_l)
    back = from_limbs(_untranspose_tiles(t, rows))
    np.testing.assert_array_equal(back, x)


def test_untranspose_multi_tile_roundtrip():
    rows, lane_l = 256, 128   # 2 tiles (N = 2^15 shape)
    tiles = rows // lane_l
    x = np.arange(rows * LANES, dtype=np.uint64).reshape(rows, LANES)
    t = _transpose_tiles(to_limbs(x), tiles, lane_l)
    back = from_limbs(_untranspose_tiles(t, rows))
    np.testing.assert_array_equal(back, x)


def test_phase_b_table_indexing():
    # Entry [tile, cb, r] must hold table[base + global block index] where
    # block = (tile*L + r) * nb + cb  (transposed coords: the butterfly
    # block that element (tile, c, r) with c in [cb*2t, (cb+1)*2t) pairs).
    n = 1 << 12
    rows = n // LANES          # 32
    lane_l, tiles = rows, 1
    table = np.arange(4 * n, dtype=np.uint64)  # distinct values
    for t in (1, 2, 8, 64):
        base = 5
        nb = LANES // (2 * t)
        out = phase_b_table(table, base, t, tiles, lane_l)
        assert out.shape == (tiles, nb, lane_l)
        for cb in range(0, nb, max(1, nb // 4)):
            for r in range(0, lane_l, 7):
                block = r * nb + cb
                assert out[0, cb, r] == table[base + block]


def test_build_stage_lists_offsets_single_chip():
    # Phase-A twiddles for the full transform must be exactly rop[m:2m]
    # for each stride t = n/(2m) >= 128, in descending-stride order.
    n = 1 << 12
    rows = n // LANES
    lane_l, tiles = rows, 1
    rop = np.arange(n, dtype=np.uint64) + 1
    prop = rop * 2
    irop = rop * 3
    pirop = rop * 4

    def pack(a):
        return a  # keep host numpy for direct comparison

    fwd_a, fwd_b, inv_b, inv_a = build_stage_lists(
        n, rop, prop, irop, pirop, tiles, lane_l, pack=pack)
    m = 1
    for m_local, t, w, wp in fwd_a:
        assert m_local == m and t == n // (2 * m)
        np.testing.assert_array_equal(w, rop[m:2 * m])
        np.testing.assert_array_equal(wp, prop[m:2 * m])
        m *= 2
    # Phase-B stages continue the same m sequence via layout tables.
    for m_local, t, w, wp in fwd_b:
        assert m_local == m and t == n // (2 * m)
        np.testing.assert_array_equal(
            w, phase_b_table(rop, m, t, tiles, lane_l))
        m *= 2
    assert m == n  # all log2(n) stages covered

    # Inverse: stage-major walk; root_index advances by n/(2t) per stage.
    root_index = 1
    t = 1
    for m_local, tt, w, wp in inv_b + inv_a:
        assert tt == t and m_local == n // (2 * t)
        if t < LANES:
            np.testing.assert_array_equal(
                w, phase_b_table(irop, root_index, t, tiles, lane_l))
        else:
            np.testing.assert_array_equal(
                w, irop[root_index:root_index + m_local])
        root_index += n // (2 * t)
        t *= 2
    assert t == n // 2  # final stage is fused with N^{-1} by the kernels


def test_build_stage_lists_shard_offsets():
    # Device d of D covers blocks [d*local_n/(2t), ...) of each stage.
    n, d_shards = 1 << 12, 4
    local_n = n // d_shards
    rows = local_n // LANES
    lane_l, tiles = rows, 1
    rop = np.arange(n, dtype=np.uint64)
    prop = rop
    irop = rop
    pirop = rop

    def pack(a):
        return a

    for d in range(d_shards):
        fwd_a, fwd_b, _, _ = build_stage_lists(
            n, rop, prop, irop, pirop, tiles, lane_l,
            base_offset=d * local_n, local_n=local_n, pack=pack)
        for m_local, t, w, wp in fwd_a:
            m_g = n // (2 * t)
            base = m_g + (d * local_n) // (2 * t)
            assert m_local == local_n // (2 * t)
            np.testing.assert_array_equal(w, rop[base:base + m_local])
