"""Transform-layer tests: vectorized batch impls vs independent scalar-loop
spec transcriptions (re-derived here on purpose, as a cross-implementation)."""

import numpy as np
import pytest

from jmcodec_tpu.ops import transform as T


# --- independent scalar implementations (spec 8.5.12.2 / 8.5.10 / 8.5.11) ---

def scalar_inverse_transform(d):
    d = d.astype(np.int64)
    f = np.zeros((4, 4), np.int64)
    for i in range(4):
        e0 = d[i][0] + d[i][2]
        e1 = d[i][0] - d[i][2]
        e2 = (d[i][1] >> 1) - d[i][3]
        e3 = d[i][1] + (d[i][3] >> 1)
        f[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    h = np.zeros((4, 4), np.int64)
    for j in range(4):
        g0 = f[0][j] + f[2][j]
        g1 = f[0][j] - f[2][j]
        g2 = (f[1][j] >> 1) - f[3][j]
        g3 = f[1][j] + (f[3][j] >> 1)
        h[0][j], h[1][j], h[2][j], h[3][j] = g0 + g3, g1 + g2, g1 - g2, g0 - g3
    return (h + 32) >> 6


def scalar_forward_transform(x):
    Cf = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
                  np.int64)
    return Cf @ x.astype(np.int64) @ Cf.T


def scalar_hadamard4(x):
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
                 np.int64)
    return H @ x.astype(np.int64) @ H.T


def scalar_dequant(c, qp):
    v = np.array([[10, 16, 13], [11, 18, 14], [13, 20, 16],
                  [14, 23, 18], [16, 25, 20], [18, 29, 23]])
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        for j in range(4):
            idx = 0 if (i % 2 == 0 and j % 2 == 0) else (1 if (i % 2 and j % 2) else 2)
            ls = 16 * v[qp % 6][idx]  # flat weightScale 16
            if qp >= 24:
                out[i][j] = (c[i][j] * ls) << (qp // 6 - 4)
            else:
                out[i][j] = (c[i][j] * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)
    return out


def scalar_luma_dc(c, qp):
    f = scalar_hadamard4(c)
    v0 = [10, 11, 13, 14, 16, 18][qp % 6]
    ls = 16 * v0
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        for j in range(4):
            if qp >= 36:
                out[i][j] = (f[i][j] * ls) << (qp // 6 - 6)
            else:
                out[i][j] = (f[i][j] * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)
    return out


def scalar_chroma_dc(c, qpc):
    H = np.array([[1, 1], [1, -1]], np.int64)
    f = H @ c.astype(np.int64) @ H
    v0 = [10, 11, 13, 14, 16, 18][qpc % 6]
    return (f * 16 * v0 * (1 << (qpc // 6))) >> 5


rng = np.random.default_rng(0)


def test_inverse_transform_matches_scalar():
    d = rng.integers(-2048, 2048, size=(64, 4, 4)).astype(np.int32)
    got = T.np_inverse_transform_4x4(d)
    for k in range(64):
        np.testing.assert_array_equal(got[k], scalar_inverse_transform(d[k]))


def test_forward_transform_matches_scalar():
    x = rng.integers(-255, 256, size=(64, 4, 4)).astype(np.int32)
    got = T.np_forward_transform_4x4(x)
    for k in range(64):
        np.testing.assert_array_equal(got[k], scalar_forward_transform(x[k]))


def test_hadamard_selfinverse():
    x = rng.integers(-512, 512, size=(16, 4, 4)).astype(np.int32)
    hh = T.hadamard_4x4(T.hadamard_4x4(x, np), np)
    np.testing.assert_array_equal(hh, 16 * x)
    x2 = rng.integers(-512, 512, size=(16, 2, 2)).astype(np.int32)
    hh2 = T.hadamard_2x2(T.hadamard_2x2(x2, np), np)
    np.testing.assert_array_equal(hh2, 4 * x2)


@pytest.mark.parametrize("qp", [0, 5, 11, 23, 24, 30, 39, 51])
def test_dequant_matches_scalar(qp):
    c = rng.integers(-256, 256, size=(32, 4, 4)).astype(np.int32)
    got = T.np_dequant_4x4(c, qp)
    for k in range(32):
        np.testing.assert_array_equal(got[k], scalar_dequant(c[k], qp))


@pytest.mark.parametrize("qp", [0, 7, 23, 30, 35, 36, 44, 51])
def test_luma_dc_matches_scalar(qp):
    c = rng.integers(-256, 256, size=(8, 4, 4)).astype(np.int32)
    got = T.np_luma_dc_decode(c, qp)
    for k in range(8):
        np.testing.assert_array_equal(got[k], scalar_luma_dc(c[k], qp))


@pytest.mark.parametrize("qpc", [0, 10, 26, 33, 39])
def test_chroma_dc_matches_scalar(qpc):
    c = rng.integers(-256, 256, size=(8, 2, 2)).astype(np.int32)
    got = T.np_chroma_dc_decode(c, qpc)
    for k in range(8):
        np.testing.assert_array_equal(got[k], scalar_chroma_dc(c[k], qpc))


def test_quant_dequant_reconstruction_error_bounded():
    """End-to-end transform/quant loop: recon error must shrink with QP."""
    x = rng.integers(-200, 200, size=(128, 4, 4)).astype(np.int32)
    prev_err = None
    for qp in [40, 28, 16, 4]:
        w = T.np_forward_transform_4x4(x)
        z = T.np_quant_4x4(w, qp, intra=True)
        d = T.np_dequant_4x4(z, qp)
        r = T.np_inverse_transform_4x4(d)
        err = np.abs(r - x).mean()
        if prev_err is not None:
            assert err < prev_err + 1e-9
        prev_err = err
    assert prev_err < 1.0  # qp=4 nearly lossless


def test_chroma_qp_table():
    assert T.chroma_qp(0, 0) == 0
    assert T.chroma_qp(29, 0) == 29
    assert T.chroma_qp(30, 0) == 29
    assert T.chroma_qp(40, 0) == 36
    assert T.chroma_qp(51, 0) == 39
    assert T.chroma_qp(51, 12) == 39  # clipped


def test_zigzag_inverse():
    np.testing.assert_array_equal(
        T.ZIGZAG4x4[T.INV_ZIGZAG4x4], np.arange(16))
