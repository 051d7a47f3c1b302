"""Intra prediction: table-driven gather form vs independent scalar spec
transcriptions for every directional mode."""

import numpy as np
import pytest

from jmcodec_tpu.ops import intra as I

rng = np.random.default_rng(3)


def scalar_pred4x4(mode, t, l, tl):
    """Direct per-pixel transcription of spec 8.3.1.2.2-8.3.1.2.9.
    t: 8 top pixels, l: 4 left, tl: corner. Returns [y][x]."""
    def p(x, y):
        if x == -1 and y == -1:
            return tl
        if y == -1:
            return t[x]
        return l[y]

    out = np.zeros((4, 4), np.int64)
    for y in range(4):
        for x in range(4):
            if mode == I.I4_V:
                v = p(x, -1)
            elif mode == I.I4_H:
                v = p(-1, y)
            elif mode == I.I4_DDL:
                if x == 3 and y == 3:
                    v = (p(6, -1) + 3 * p(7, -1) + 2) >> 2
                else:
                    v = (p(x + y, -1) + 2 * p(x + y + 1, -1) + p(x + y + 2, -1) + 2) >> 2
            elif mode == I.I4_DDR:
                if x > y:
                    v = (p(x - y - 2, -1) + 2 * p(x - y - 1, -1) + p(x - y, -1) + 2) >> 2
                elif x < y:
                    v = (p(-1, y - x - 2) + 2 * p(-1, y - x - 1) + p(-1, y - x) + 2) >> 2
                else:
                    v = (p(0, -1) + 2 * p(-1, -1) + p(-1, 0) + 2) >> 2
            elif mode == I.I4_VR:
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    v = (p(x - (y >> 1) - 1, -1) + p(x - (y >> 1), -1) + 1) >> 1
                elif z >= 0:
                    v = (p(x - (y >> 1) - 2, -1) + 2 * p(x - (y >> 1) - 1, -1)
                         + p(x - (y >> 1), -1) + 2) >> 2
                elif z == -1:
                    v = (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
                else:
                    v = (p(-1, y - 2 * x - 1) + 2 * p(-1, y - 2 * x - 2)
                         + p(-1, y - 2 * x - 3) + 2) >> 2
            elif mode == I.I4_HD:
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    v = (p(-1, y - (x >> 1) - 1) + p(-1, y - (x >> 1)) + 1) >> 1
                elif z >= 0:
                    v = (p(-1, y - (x >> 1) - 2) + 2 * p(-1, y - (x >> 1) - 1)
                         + p(-1, y - (x >> 1)) + 2) >> 2
                elif z == -1:
                    v = (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
                else:
                    v = (p(x - 2 * y - 1, -1) + 2 * p(x - 2 * y - 2, -1)
                         + p(x - 2 * y - 3, -1) + 2) >> 2
            elif mode == I.I4_VL:
                if y % 2 == 0:
                    v = (p(x + (y >> 1), -1) + p(x + (y >> 1) + 1, -1) + 1) >> 1
                else:
                    v = (p(x + (y >> 1), -1) + 2 * p(x + (y >> 1) + 1, -1)
                         + p(x + (y >> 1) + 2, -1) + 2) >> 2
            elif mode == I.I4_HU:
                z = x + 2 * y
                if z in (0, 2, 4):
                    v = (p(-1, y + (x >> 1)) + p(-1, y + (x >> 1) + 1) + 1) >> 1
                elif z in (1, 3):
                    v = (p(-1, y + (x >> 1)) + 2 * p(-1, y + (x >> 1) + 1)
                         + p(-1, y + (x >> 1) + 2) + 2) >> 2
                elif z == 5:
                    v = (p(-1, 2) + 3 * p(-1, 3) + 2) >> 2
                else:
                    v = p(-1, 3)
            out[y][x] = v
    return out


@pytest.mark.parametrize("mode", [m for m in range(9) if m != I.I4_DC])
def test_directional_modes_match_scalar(mode):
    for _ in range(50):
        t = rng.integers(0, 256, 8).astype(np.int32)
        l = rng.integers(0, 256, 4).astype(np.int32)
        tl = int(rng.integers(0, 256))
        got = I.pred4x4(mode, t, l, tl, True, True)
        np.testing.assert_array_equal(got, scalar_pred4x4(mode, t, l, tl))


def test_dc_modes():
    t = np.arange(8, dtype=np.int32)
    l = np.full(4, 100, np.int32)
    # both: (0+1+2+3 + 400 + 4) >> 3 = 410>>3 = 51
    assert I.pred4x4(I.I4_DC, t, l, 7, True, True)[0, 0] == (6 + 400 + 4) >> 3
    assert I.pred4x4(I.I4_DC, t, l, 7, False, True)[0, 0] == (400 + 2) >> 2
    assert I.pred4x4(I.I4_DC, t, l, 7, True, False)[0, 0] == (6 + 2) >> 2
    assert I.pred4x4(I.I4_DC, t, l, 7, False, False)[0, 0] == 128


def test_pred16x16_dc_and_plane():
    t = rng.integers(0, 256, 16).astype(np.int32)
    l = rng.integers(0, 256, 16).astype(np.int32)
    tl = 128
    dc = I.pred16x16(I.I16_DC, t, l, tl, True, True)
    assert (dc == (int(t.sum()) + int(l.sum()) + 16) >> 5).all()
    v = I.pred16x16(I.I16_V, t, l, tl, True, True)
    np.testing.assert_array_equal(v[5], t)
    h = I.pred16x16(I.I16_H, t, l, tl, True, True)
    np.testing.assert_array_equal(h[:, 3], l)
    pl = I.pred16x16(I.I16_PLANE, t, l, tl, True, True)
    assert pl.shape == (16, 16) and pl.min() >= 0 and pl.max() <= 255
    # plane of a flat surface is flat
    flat = I.pred16x16(I.I16_PLANE, np.full(16, 77), np.full(16, 77), 77, True, True)
    assert (flat == 77).all()


def test_pred_chroma_dc_blocks():
    t = np.concatenate([np.full(4, 40), np.full(4, 80)]).astype(np.int32)
    l = np.concatenate([np.full(4, 120), np.full(4, 200)]).astype(np.int32)
    out = I.pred_chroma8x8(I.IC_DC, t, l, 0, True, True)
    assert out[0, 0] == (40 * 4 + 120 * 4 + 4) >> 3
    assert out[0, 7] == (80 * 4 + 2) >> 2          # top-right block: top only
    assert out[7, 0] == (200 * 4 + 2) >> 2         # bottom-left block: left only
    assert out[7, 7] == (80 * 4 + 200 * 4 + 4) >> 3
    # no neighbors
    out2 = I.pred_chroma8x8(I.IC_DC, t, l, 0, False, False)
    assert (out2 == 128).all()


def test_pred_chroma_plane_flat():
    flat = I.pred_chroma8x8(I.IC_PLANE, np.full(8, 90), np.full(8, 90), 90,
                            True, True)
    assert (flat == 90).all()
