"""H.264 exact integer transforms + quantization (spec 8.5, Annex A flat matrices).

All functions are *array-module generic*: they use only operators/ufuncs that
numpy and jax.numpy share, on int32 inputs, so the same code is the CPU
reference oracle and the TPU device path (VPU element-wise adds/shifts — the
4x4 transform is bandwidth-bound, not MXU-bound, so butterflies beat matmuls
and, critically, reproduce the spec's truncating ``>>1`` bit-exactly).

Reference capability analog: this math lived inside the vendor silicon the
reference delegated to (SURVEY §2.2 rows 15/18); nothing to cite line-for-line.

Shapes: blocks are batched as [..., 4, 4] (or [..., 2, 2] for chroma DC).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables (spec 8.5.12: normAdjust4x4 "v"; JM encoder MF "quant_coef")
# ---------------------------------------------------------------------------

# normAdjust4x4(m, idx): idx 0 = (even,even), 1 = (odd,odd), 2 = other
_V = np.array(
    [[10, 16, 13],
     [11, 18, 14],
     [13, 20, 16],
     [14, 23, 18],
     [16, 25, 20],
     [18, 29, 23]], dtype=np.int32)

_MF = np.array(
    [[13107, 5243, 8066],
     [11916, 4660, 7490],
     [10082, 4194, 6554],
     [9362, 3647, 5825],
     [8192, 3355, 5243],
     [7282, 2893, 4559]], dtype=np.int32)

# position-class index for a 4x4 block: 0 if (i,j) both even, 1 both odd, 2 else
_POS_IDX = np.array(
    [[0, 2, 0, 2],
     [2, 1, 2, 1],
     [0, 2, 0, 2],
     [2, 1, 2, 1]], dtype=np.int32)

# Dequant table DQ[m, i, j] = v[m, posidx(i,j)]  (flat weightScale = 16 folded)
DEQUANT4x4 = _V[:, _POS_IDX]        # [6, 4, 4]
QUANT_MF4x4 = _MF[:, _POS_IDX]      # [6, 4, 4]

# Chroma QP mapping, qPi 0..51 -> QPc (spec table 8-15)
CHROMA_QP = np.array(
    list(range(30)) +
    [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38, 38,
     39, 39, 39, 39], dtype=np.int32)

# zig-zag scan for 4x4 (spec table 8-13, frame coding)
ZIGZAG4x4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                     dtype=np.int32)
# inverse: raster position of scan index
INV_ZIGZAG4x4 = np.argsort(ZIGZAG4x4).astype(np.int32)


def chroma_qp(qp_y, chroma_qp_index_offset: int):
    """QPc from luma QP + PPS offset (spec 8.5.8). Works on scalars or arrays."""
    qpi = np.clip(qp_y + chroma_qp_index_offset, 0, 51)
    return CHROMA_QP[qpi]


# ---------------------------------------------------------------------------
# Core 4x4 transform butterflies (exact, batched on last two dims)
# ---------------------------------------------------------------------------

def _rows(x):
    """Split [..., 4, n] into its 4 row slices."""
    return x[..., 0, :], x[..., 1, :], x[..., 2, :], x[..., 3, :]


def inverse_transform_4x4(d, xp):
    """Spec 8.5.12.2: inverse core transform incl. final (x+32)>>6 rounding.

    d: [..., 4, 4] int32 dequantized coefficients -> [..., 4, 4] int32 residual.
    """
    # horizontal (rows of d treated as columns first per spec: first operate on
    # columns i: e/f on rows, then on columns). Spec: first each *row* of d
    # (i fixed, j varies)?  8.5.12.2 step 1 operates on COLUMNS? The standard
    # defines: e_i0.. using d_i0..d_i3 (i.e. along j: horizontal), producing f;
    # then the same vertically on f producing h; then (h + 32) >> 6.
    d0 = d[..., :, 0]
    d1 = d[..., :, 1]
    d2 = d[..., :, 2]
    d3 = d[..., :, 3]
    e0 = d0 + d2
    e1 = d0 - d2
    e2 = (d1 >> 1) - d3
    e3 = d1 + (d3 >> 1)
    f0 = e0 + e3
    f1 = e1 + e2
    f2 = e1 - e2
    f3 = e0 - e3
    f = xp.stack([f0, f1, f2, f3], axis=-1)  # [..., 4(i), 4(j)]
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h0 = g0 + g3
    h1 = g1 + g2
    h2 = g1 - g2
    h3 = g0 - g3
    h = xp.stack([h0, h1, h2, h3], axis=-2)
    return (h + 32) >> 6


def forward_transform_4x4(x, xp):
    """Encoder-side core transform W = Cf X Cf^T (exact; no scaling)."""
    # vertical: rows combine
    r0, r1, r2, r3 = _rows(x)
    s0 = r0 + r3
    s1 = r1 + r2
    s2 = r1 - r2
    s3 = r0 - r3
    t0 = s0 + s1
    t1 = 2 * s3 + s2
    t2 = s0 - s1
    t3 = s3 - 2 * s2
    t = xp.stack([t0, t1, t2, t3], axis=-2)  # [..., 4, 4]
    c0 = t[..., :, 0]
    c1 = t[..., :, 1]
    c2 = t[..., :, 2]
    c3 = t[..., :, 3]
    u0 = c0 + c3
    u1 = c1 + c2
    u2 = c1 - c2
    u3 = c0 - c3
    w0 = u0 + u1
    w1 = 2 * u3 + u2
    w2 = u0 - u1
    w3 = u3 - 2 * u2
    return xp.stack([w0, w1, w2, w3], axis=-1)


def hadamard_4x4(x, xp):
    """4x4 Hadamard (self-inverse up to scale). Used fwd (enc DC) and inv (8.5.10)."""
    r0, r1, r2, r3 = _rows(x)
    s0 = r0 + r3
    s1 = r1 + r2
    s2 = r1 - r2
    s3 = r0 - r3
    t0 = s0 + s1
    t1 = s3 + s2
    t2 = s0 - s1
    t3 = s3 - s2
    t = xp.stack([t0, t1, t2, t3], axis=-2)
    c0 = t[..., :, 0]
    c1 = t[..., :, 1]
    c2 = t[..., :, 2]
    c3 = t[..., :, 3]
    u0 = c0 + c3
    u1 = c1 + c2
    u2 = c1 - c2
    u3 = c0 - c3
    w0 = u0 + u1
    w1 = u3 + u2
    w2 = u0 - u1
    w3 = u3 - u2
    return xp.stack([w0, w1, w2, w3], axis=-1)


def hadamard_2x2(x, xp):
    """2x2 Hadamard for chroma DC (both fwd and inv)."""
    a = x[..., 0, 0]
    b = x[..., 0, 1]
    c = x[..., 1, 0]
    d = x[..., 1, 1]
    return xp.stack([
        xp.stack([a + b + c + d, a - b + c - d], axis=-1),
        xp.stack([a + b - c - d, a - b - c + d], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# Quant / dequant
# ---------------------------------------------------------------------------

def dequant_4x4(c, qp, xp, dq_table):
    """Spec 8.5.12.1 with flat scaling lists: d = c * DQ[qp%6] << (qp//6).

    Exact for all qp (the 16x weightScale makes the low-qp shift lossless).
    c: [..., 4, 4] int32; qp: scalar or broadcastable array.
    """
    m = qp % 6
    shift = qp // 6
    scale = dq_table[m]  # [..., 4, 4] via fancy index (numpy) / take (jnp)
    return (c * scale) << _bshape(shift, xp)


def _bshape(shift, xp):
    """Broadcast a per-block shift over block dims if it is an array."""
    if hasattr(shift, "ndim") and getattr(shift, "ndim", 0) > 0:
        return shift[..., None, None]
    return shift


def dequant_luma_dc(f, qp, xp, dq_table):
    """Spec 8.5.10 (after inverse Hadamard): per-element exact scaling."""
    ls = dq_table[qp % 6][..., 0, 0] * 16  # LevelScale4x4(m,0,0) with flat WS
    q6 = qp // 6
    # qp >= 36 branch: (f*ls) << (q6-6); else (f*ls + 2^(5-q6)) >> (6-q6)
    hi = (f * ls) << _clip_shift(q6 - 6)
    lo = (f * ls + (1 << _clip_shift(5 - q6))) >> _clip_shift(6 - q6)
    return xp.where(qp >= 36, hi, lo) if _is_array(qp, xp) else (
        hi if qp >= 36 else lo)


def _clip_shift(s):
    if hasattr(s, "ndim") and getattr(s, "ndim", 0) > 0:
        return np.maximum(s, 0)
    if not isinstance(s, (int, np.integer)):
        # traced jax scalar
        import jax.numpy as jnp
        return jnp.maximum(s, 0)
    return max(int(s), 0)


def _is_array(x, xp) -> bool:
    return hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 0 and not isinstance(
        x, (int, np.integer))


def dequant_chroma_dc(f, qpc, xp, dq_table):
    """Spec 8.5.11: dcC = ((f * LS(qPc%6,0,0)) << (qPc//6)) >> 5."""
    ls = dq_table[qpc % 6][..., 0, 0] * 16
    return ((f * ls) << (qpc // 6)) >> 5


def quant_4x4(w, qp, intra: bool, xp, mf_table):
    """Encoder quantizer (JM-style, non-normative): sign(|W|*MF + f) >> qbits."""
    qbits = 15 + qp // 6
    mf = mf_table[qp % 6]
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    aw = xp.abs(w)
    z = (aw * mf + f) >> qbits
    return xp.where(w < 0, -z, z)


def quant_dc(w, qp, xp, mf_table, nbits_extra: int = 1):
    """Encoder DC quantizer: (|W|*MF(0,0) + 2f) >> (qbits+1) (luma 4x4 Hadamard)
    or chroma 2x2 (same formula)."""
    qbits = 15 + qp // 6
    mf = mf_table[qp % 6][..., 0, 0]
    f = 2 * ((1 << qbits) // 3)
    aw = xp.abs(w)
    z = (aw * mf + f) >> (qbits + nbits_extra)
    return xp.where(w < 0, -z, z)


# ---------------------------------------------------------------------------
# numpy-facing convenience wrappers (used by the reference codec path)
# ---------------------------------------------------------------------------

def np_inverse_transform_4x4(d):
    return inverse_transform_4x4(d.astype(np.int32), np)


def np_forward_transform_4x4(x):
    return forward_transform_4x4(x.astype(np.int32), np)


def np_dequant_4x4(c, qp):
    return dequant_4x4(c.astype(np.int32), qp, np, DEQUANT4x4)


def np_quant_4x4(w, qp, intra):
    return quant_4x4(w.astype(np.int32), qp, intra, np, QUANT_MF4x4)


def np_luma_dc_decode(c_dc, qp):
    """Inverse Hadamard + scaling for the I16x16 luma DC block."""
    f = hadamard_4x4(c_dc.astype(np.int32), np)
    return dequant_luma_dc(f, qp, np, DEQUANT4x4)


def np_chroma_dc_decode(c_dc, qpc):
    f = hadamard_2x2(c_dc.astype(np.int32), np)
    return dequant_chroma_dc(f, qpc, np, DEQUANT4x4)


# ---------------------------------------------------------------------------
# 8x8 transform (High profile, spec 8.5.12.2/8.5.13) — flat scaling matrices
# ---------------------------------------------------------------------------

def _zigzag(n):
    """Classic zigzag scan order for an n x n block (spec Table 8-8 for 8x8
    frame coding): raster index of each scan position."""
    order = sorted(range(n * n),
                   key=lambda p: ((p // n) + (p % n),
                                  (p // n) if ((p // n) + (p % n)) % 2
                                  else (p % n)))
    return np.array(order, dtype=np.int32)


ZIGZAG8x8 = _zigzag(8)
assert ZIGZAG4x4.tolist() == _zigzag(4).tolist(), "zigzag generator bug"

# normAdjust8x8 "v" values per m = QP%6 (spec 8.5.13.1)
_V8 = np.array(
    [[20, 18, 32, 19, 25, 24],
     [22, 19, 35, 21, 28, 26],
     [26, 23, 42, 24, 33, 31],
     [28, 25, 45, 26, 35, 33],
     [32, 28, 51, 30, 40, 38],
     [36, 32, 58, 34, 46, 43]], dtype=np.int32)

# position-class map for 8x8 (i=row, j=col)
_POS8 = np.zeros((8, 8), np.int32)
for _i in range(8):
    for _j in range(8):
        if _i % 4 == 0 and _j % 4 == 0:
            _POS8[_i, _j] = 0
        elif _i % 2 == 1 and _j % 2 == 1:
            _POS8[_i, _j] = 1
        elif _i % 4 == 2 and _j % 4 == 2:
            _POS8[_i, _j] = 2
        elif (_i % 4 == 0 and _j % 2 == 1) or (_i % 2 == 1 and _j % 4 == 0):
            _POS8[_i, _j] = 3
        elif (_i % 4 == 0 and _j % 4 == 2) or (_i % 4 == 2 and _j % 4 == 0):
            _POS8[_i, _j] = 4
        else:
            _POS8[_i, _j] = 5

# LevelScale8x8[m][i][j] with flat weightScale8x8 == 16 folded in
DEQUANT8x8 = 16 * _V8[:, _POS8]     # [6, 8, 8]


def dequant_8x8(blocks, qp, xp, dq=None):
    """Spec 8.5.13.1 scaling for 8x8 luma blocks. blocks [..., 8, 8] int32
    levels; qp scalar or [...] per-block; returns dequantized d[..., 8, 8]."""
    if dq is None:
        dq = DEQUANT8x8 if xp is np else xp.asarray(DEQUANT8x8)
    qp = xp.asarray(qp)
    ls = dq[qp % 6]                      # [..., 8, 8]
    q6 = qp // 6
    shift_hi = xp.maximum(q6 - 6, 0)[..., None, None]
    shift_lo = xp.maximum(6 - q6, 0)[..., None, None]
    rnd = (1 << xp.maximum(5 - q6, 0))[..., None, None]
    hi = (blocks * ls) << shift_hi
    lo = (blocks * ls + rnd) >> shift_lo
    return xp.where((qp >= 36)[..., None, None], hi, lo)


def np_dequant_8x8(block, qp: int):
    return np.asarray(dequant_8x8(block[None], np.array([qp]), np))[0]


def _rows8(x):
    return tuple(x[..., r, :] for r in range(8))


def inverse_transform_8x8(d, xp):
    """Spec 8.5.12.2 8x8 inverse transform incl. final (x+32)>>6. Exact
    integer butterflies; d [..., 8, 8] int32."""
    def butterfly(d0, d1, d2, d3, d4, d5, d6, d7):
        e0 = d0 + d4
        e1 = -d3 + d5 - d7 - (d7 >> 1)
        e2 = d0 - d4
        e3 = d1 + d7 - d3 - (d3 >> 1)
        e4 = (d2 >> 1) - d6
        e5 = -d1 + d7 + d5 + (d5 >> 1)
        e6 = d2 + (d6 >> 1)
        e7 = d3 + d5 + d1 + (d1 >> 1)
        f0 = e0 + e6
        f1 = e1 + (e7 >> 2)
        f2 = e2 + e4
        f3 = e3 + (e5 >> 2)
        f4 = e2 - e4
        f5 = (e3 >> 2) - e5
        f6 = e0 - e6
        f7 = e7 - (e1 >> 2)
        return (f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                f6 - f1, f4 - f3, f2 - f5, f0 - f7)

    # horizontal pass: butterfly over the 8 elements of each row
    h = butterfly(*tuple(d[..., :, i] for i in range(8)))
    dh = xp.stack(h, axis=-1)                 # [..., 8, 8]
    # vertical pass: butterfly over the 8 elements of each column
    v = butterfly(*tuple(dh[..., i, :] for i in range(8)))
    out = xp.stack(v, axis=-2)
    return (out + 32) >> 6


def np_inverse_transform_8x8(d):
    return np.asarray(inverse_transform_8x8(np.asarray(d, np.int32), np))
