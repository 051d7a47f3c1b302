"""Sharded transcode step: decode-output frames -> 2x downscale -> intra
encode forward pass, SPMD over a (dp, sp) mesh with explicit collectives.

This is the multi-chip "training-step analog" of the framework (the driver's
dryrun compiles it on an N-device mesh): frames are sharded batch-over-dp and
rows-over-sp; the vertical [1,2,1]/4 pre-filter of the downscaler needs one
halo row from the sp-neighbor (jax.lax.ppermute over ICI), and rate-control
statistics are reduced with psum over the whole mesh (SURVEY §5.8: the
distributed analogs of the reference's intra-process queues and DMA).

The reference's transcode was an unimplemented TODO (README.md:177-188);
BASELINE.json makes it a first-class config.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops import transform as T
from .mesh import ShardingConfig, build_mesh


def _downscale2x_with_halo(Y, axis_sp: str):
    """[B, h_shard, W] -> [B, h_shard/2, W/2]; vertical [1,2,1]/4 smoothing
    needs the neighbor shard's boundary rows (ring-less ppermute shift)."""
    n_sp = jax.lax.psum(1, axis_sp)
    idx = jax.lax.axis_index(axis_sp)
    # fetch last row of previous shard and first row of next shard
    up = jax.lax.ppermute(Y[:, -1:, :], axis_sp,
                          [(i, (i + 1) % n_sp) for i in range(n_sp)])
    down = jax.lax.ppermute(Y[:, :1, :], axis_sp,
                            [(i, (i - 1) % n_sp) for i in range(n_sp)])
    # frame boundary: replicate edge rows instead of wrapping
    up = jnp.where(idx == 0, Y[:, :1, :], up)
    down = jnp.where(idx == n_sp - 1, Y[:, -1:, :], down)
    ext = jnp.concatenate([up, Y, down], axis=1)       # [B, h+2, W]
    smoothed = (ext[:, :-2, :] + 2 * ext[:, 1:-1, :] + ext[:, 2:, :] + 2) >> 2
    # horizontal smoothing needs no halo (full W is local)
    extw = jnp.pad(smoothed, ((0, 0), (0, 0), (1, 1)), mode="edge")
    sm = (extw[:, :, :-2] + 2 * extw[:, :, 1:-1] + extw[:, :, 2:] + 2) >> 2
    return sm[:, ::2, ::2]


def _encode_forward(Y, qp):
    """Batched intra-frame forward pass on a row shard: 4x4 transform + quant
    + exact recon; returns (levels, bits_estimate, ssd)."""
    B, h, w = Y.shape
    resid = Y.astype(jnp.int32) - 128  # flat-DC prediction baseline
    blocks = resid.reshape(B, h // 4, 4, w // 4, 4).transpose(0, 1, 3, 2, 4)
    wt = T.forward_transform_4x4(blocks, jnp)
    z = T.quant_4x4(wt, qp, True, jnp, jnp.asarray(T.QUANT_MF4x4))
    d = T.dequant_4x4(z, qp, jnp, jnp.asarray(T.DEQUANT4x4))
    rec = T.inverse_transform_4x4(d, jnp)
    err = (rec - blocks).astype(jnp.int64)
    ssd = jnp.sum(err * err)
    bits = jnp.sum(jnp.abs(z)) * 2 + jnp.sum(z != 0)  # cheap CAVLC size proxy
    return z, bits, ssd


def make_transcode_step(mesh, cfg: ShardingConfig, qp: int = 30):
    """Build the jitted SPMD transcode step for a given mesh.

    Input:  Y [B, H, W] uint8 frames (the decoder's output batch)
    Output: levels [B, H/8, W/8, 4, 4] int32 (downscaled, transformed,
            quantized), plus global (bits, ssd) psum-reduced over the mesh.
    """
    spec_in = P(cfg.axis_dp, cfg.axis_sp, None)
    spec_lvl = P(cfg.axis_dp, cfg.axis_sp, None, None, None)
    spec_scalar = P()

    def step(Y):
        Ys = _downscale2x_with_halo(Y.astype(jnp.int32), cfg.axis_sp)
        z, bits, ssd = _encode_forward(Ys, qp)
        gbits = jax.lax.psum(bits, (cfg.axis_dp, cfg.axis_sp))
        gssd = jax.lax.psum(ssd, (cfg.axis_dp, cfg.axis_sp))
        return z, gbits, gssd

    sharded = shard_map(step, mesh=mesh, in_specs=(spec_in,),
                        out_specs=(spec_lvl, spec_scalar, spec_scalar))
    return jax.jit(sharded)


def run_transcode_demo(n_devices: int, B: int = 2, H: int = 64, W: int = 64,
                       qp: int = 30):
    """Build a mesh over n_devices, run one sharded transcode step on tiny
    shapes. Used by the driver's multichip dryrun and tests."""
    cfg = ShardingConfig.auto(n_devices)
    mesh = build_mesh(cfg)
    step = make_transcode_step(mesh, cfg, qp=qp)
    rng = np.random.default_rng(0)
    # shapes must tile: rows divisible by sp * 8 (downscale 2x then 4x4 grid)
    H = max(H, cfg.sp * 16)
    B = max(B, cfg.dp)
    Y = rng.integers(0, 256, (B, H, W), np.uint8)
    from .mesh import shard_frames
    Yd = shard_frames(mesh, cfg, Y)
    z, bits, ssd = step(Yd)
    jax.block_until_ready(z)
    return np.asarray(z), int(bits), int(ssd), cfg
