"""Motion compensation vs independent scalar spec transcription (8.4.2.2)."""

import numpy as np
import pytest

from jmcodec_tpu.ops import mc as MC

rng = np.random.default_rng(21)


def scalar_luma_sample(ref, x, y, mvx, mvy):
    """Fully scalar per spec: clamped addressing + 6-tap + quarter averages."""
    H, W = ref.shape

    def p(xx, yy):
        return int(ref[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)])

    xi = x + (mvx >> 2)
    yi = y + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3

    def half_h(xx, yy):  # b-style, at (xx+1/2, yy)
        t = (p(xx - 2, yy) - 5 * p(xx - 1, yy) + 20 * p(xx, yy)
             + 20 * p(xx + 1, yy) - 5 * p(xx + 2, yy) + p(xx + 3, yy))
        return np.clip((t + 16) >> 5, 0, 255), t

    def half_v(xx, yy):
        t = (p(xx, yy - 2) - 5 * p(xx, yy - 1) + 20 * p(xx, yy)
             + 20 * p(xx, yy + 1) - 5 * p(xx, yy + 2) + p(xx, yy + 3))
        return np.clip((t + 16) >> 5, 0, 255), t

    def center_j(xx, yy):
        t = 0
        coefs = [1, -5, 20, 20, -5, 1]
        for k, c in enumerate(coefs):
            _, b1 = half_h(xx, yy - 2 + k)
            t += c * b1
        return np.clip((t + 512) >> 10, 0, 255)

    G = p(xi, yi)
    if (fx, fy) == (0, 0):
        return G
    b, _ = half_h(xi, yi)
    h, _ = half_v(xi, yi)
    j = center_j(xi, yi)
    m, _ = half_v(xi + 1, yi)
    s, _ = half_h(xi, yi + 1)
    Hs = p(xi + 1, yi)
    Ms = p(xi, yi + 1)
    table = {
        (1, 0): (G + b + 1) >> 1, (2, 0): b, (3, 0): (Hs + b + 1) >> 1,
        (0, 1): (G + h + 1) >> 1, (0, 2): h, (0, 3): (Ms + h + 1) >> 1,
        (2, 2): j,
        (1, 2): (h + j + 1) >> 1, (3, 2): (m + j + 1) >> 1,
        (2, 1): (b + j + 1) >> 1, (2, 3): (s + j + 1) >> 1,
        (1, 1): (b + h + 1) >> 1, (3, 1): (b + m + 1) >> 1,
        (1, 3): (s + h + 1) >> 1, (3, 3): (s + m + 1) >> 1,
    }
    return table[(fx, fy)]


@pytest.mark.parametrize("fx", [0, 1, 2, 3])
@pytest.mark.parametrize("fy", [0, 1, 2, 3])
def test_luma_mc_all_fracs(fx, fy):
    ref = rng.integers(0, 256, (40, 48)).astype(np.int32)
    refp = MC.pad_ref(ref)
    for _ in range(5):
        x0 = int(rng.integers(0, 32))
        y0 = int(rng.integers(0, 24))
        mvx = int(rng.integers(-6, 7)) * 4 + fx
        mvy = int(rng.integers(-6, 7)) * 4 + fy
        got = MC.mc_luma_block(refp, x0, y0, mvx, mvy, 8, 8)
        for yy in range(8):
            for xx in range(8):
                want = scalar_luma_sample(ref, x0 + xx, y0 + yy, mvx, mvy)
                assert got[yy, xx] == want, (fx, fy, xx, yy, got[yy, xx], want)


def test_luma_mc_edge_replication():
    ref = rng.integers(0, 256, (24, 24)).astype(np.int32)
    refp = MC.pad_ref(ref)
    # MV pointing well outside the frame, still within pad
    got = MC.mc_luma_block(refp, 0, 0, -40, -40, 4, 4)
    want = np.array([[scalar_luma_sample(ref, x, y, -40, -40)
                      for x in range(4)] for y in range(4)])
    np.testing.assert_array_equal(got, want)


def scalar_chroma_sample(ref, x, y, mvx, mvy):
    H, W = ref.shape

    def p(xx, yy):
        return int(ref[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)])

    xi = x + (mvx >> 3)
    yi = y + (mvy >> 3)
    dx, dy = mvx & 7, mvy & 7
    return ((8 - dx) * (8 - dy) * p(xi, yi) + dx * (8 - dy) * p(xi + 1, yi)
            + (8 - dx) * dy * p(xi, yi + 1) + dx * dy * p(xi + 1, yi + 1)
            + 32) >> 6


def test_chroma_mc():
    ref = rng.integers(0, 256, (20, 24)).astype(np.int32)
    refp = MC.pad_ref(ref)
    for _ in range(30):
        x0 = int(rng.integers(0, 16))
        y0 = int(rng.integers(0, 12))
        mvx = int(rng.integers(-60, 60))
        mvy = int(rng.integers(-60, 60))
        got = MC.mc_chroma_block(refp, x0, y0, mvx, mvy, 4, 4)
        for yy in range(4):
            for xx in range(4):
                want = scalar_chroma_sample(ref, x0 + xx, y0 + yy, mvx, mvy)
                assert got[yy, xx] == want
