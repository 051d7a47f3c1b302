"""Pallas TPU kernel: fused dequant + inverse 4x4 transform over a whole
frame's coefficient blocks.

One VMEM pass computes d = (c * DQ[qp%6]) << (qp//6) followed by the exact
spec butterfly IDCT (including the truncating >>1) and the final (x+32)>>6 —
the fusion XLA does piecewise, done explicitly with blocks laid out for the
VPU (the last two dims are the 4x4 block; the batch dim is tiled in VMEM-
sized chunks).

Status: standalone, bit-exact vs the jnp path in ops/transform.py (tested in
tests/test_pallas_idct.py) but NOT yet wired into the production recon scan —
the production `_residuals` splices I16x16 Hadamard DC values between dequant
and IDCT, which this kernel does not model. Integration needs a DC-plane
input + mask in the kernel and an on-TPU measurement showing it beats XLA's
own fusion; until then the jnp path is the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transform as T

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

BLOCK = 512  # coefficient blocks per grid step (512*16 int32 = 32 KB tiles)


def _kernel(c_ref, qp_ref, dq_ref, out_ref):
    """Transposed layout (position-major, Mosaic-friendly — every access is
    a contiguous row): c: [16, BLOCK] int32 where row p = raster position p
    of every block; qp: [1, BLOCK]; dq: [6, 16]; out: [16, BLOCK]."""
    qp = qp_ref[0, :]                     # [BLOCK]
    m = qp % 6
    shift = qp // 6

    # dequant each position row with a 6-way scalar select over the table
    d = [None] * 16
    for p in range(16):
        scale = jnp.zeros_like(qp)
        for k in range(6):
            scale = jnp.where(m == k, dq_ref[k, p], scale)
        d[p] = (c_ref[p, :] * scale) << shift

    def row(r):
        return d[4 * r], d[4 * r + 1], d[4 * r + 2], d[4 * r + 3]

    # horizontal butterflies per 4x4 row
    f = [None] * 16
    for r in range(4):
        d0, d1, d2, d3 = row(r)
        e0 = d0 + d2
        e1 = d0 - d2
        e2 = (d1 >> 1) - d3
        e3 = d1 + (d3 >> 1)
        f[4 * r + 0] = e0 + e3
        f[4 * r + 1] = e1 + e2
        f[4 * r + 2] = e1 - e2
        f[4 * r + 3] = e0 - e3
    # vertical butterflies per column
    for cidx in range(4):
        f0, f1, f2, f3 = f[cidx], f[cidx + 4], f[cidx + 8], f[cidx + 12]
        g0 = f0 + f2
        g1 = f0 - f2
        g2 = (f1 >> 1) - f3
        g3 = f1 + (f3 >> 1)
        out_ref[cidx, :] = (g0 + g3 + 32) >> 6
        out_ref[cidx + 4, :] = (g1 + g2 + 32) >> 6
        out_ref[cidx + 8, :] = (g1 - g2 + 32) >> 6
        out_ref[cidx + 12, :] = (g0 - g3 + 32) >> 6


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequant_idct_blocks(coeffs, qp_blk, interpret: bool = False):
    """coeffs: [N, 4, 4] int32 levels; qp_blk: [N] int32 -> [N, 4, 4] residual.
    N is padded to a BLOCK multiple internally."""
    N = coeffs.shape[0]
    Np = ((N + BLOCK - 1) // BLOCK) * BLOCK
    c = jnp.zeros((16, Np), jnp.int32).at[:, :N].set(
        coeffs.reshape(N, 16).astype(jnp.int32).T)
    q = jnp.zeros((1, Np), jnp.int32).at[0, :N].set(qp_blk.astype(jnp.int32))
    dq = jnp.asarray(T.DEQUANT4x4.reshape(6, 16))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((16, Np), jnp.int32),
        grid=(Np // BLOCK,),
        in_specs=[
            pl.BlockSpec((16, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((6, 16), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((16, BLOCK), lambda i: (0, i)),
        interpret=interpret,
    )(c, q, dq)
    return out[:, :N].T.reshape(N, 4, 4)
