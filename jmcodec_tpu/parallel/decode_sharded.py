"""The REAL codec kernels under a device mesh (SURVEY §2.3 ①③⑤).

Round-1 shipped only a toy sharded demo (transcode.py: random frames,
flat-DC forward pass). This module runs the production reconstruction
kernels — the H.264 diagonal-tile wavefront (kernels/recon_tiles.py) and
the HEVC CTB kernel (kernels/hevc_tiles.py) — SPMD over a (dp, sp) mesh:

  decode stage   frames sharded over EVERY device (dp x sp jointly): each
                 chip runs the full wavefront recon on its own frames.
                 Intra frames are independent, so this is the codec-domain
                 batch axis (GOP/frame parallelism, reference analog: one
                 decode session per stream, test_intel_dec.cpp:78-105).
  reshard        frame-parallel -> row-parallel: all_gather over sp, then
                 each sp shard keeps its own row band (the decode->filter
                 "all-to-all" reshard of SURVEY §5.7; rides ICI).
  spatial stage  2x downscale whose vertical filter needs one halo row from
                 the sp neighbor (jax.lax.ppermute) + intra-encode forward
                 pass; rate stats psum-reduced over the whole mesh.

Everything compiles to ONE jitted SPMD program: XLA inserts the
all_gather/ppermute/psum collectives from the shard_map specs.

Bit-exactness of the sharded decode vs single-device is asserted by
tests/test_parallel.py on an 8-way virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..kernels import recon_tiles
from ..kernels.recon import stack_symbols, widen_symbol_args
from .mesh import ShardingConfig, build_mesh
from .transcode import _downscale2x_with_halo, _encode_forward


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map with the varying-manual-axes check off: the wavefront scan
    seeds its carry from unvaried constants, which the vma checker rejects
    even though every lane is independent (the batch axis is the only
    sharded axis through the kernel)."""
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

# the 16 batched symbol-plane args of decode_frames_batch, all [F, ...]
_N_SYMBOL_ARGS = 16


def _batch_spec(cfg: ShardingConfig) -> P:
    """Frames sharded across the whole mesh (dp and sp jointly)."""
    return P((cfg.axis_dp, cfg.axis_sp))


def pad_batch(arrs: List[jnp.ndarray], ways: int) -> Tuple[list, int]:
    """Pad the leading frame axis to a multiple of `ways` by repeating the
    last frame; returns (padded args, original length)."""
    n = int(arrs[0].shape[0])
    pad = (-n) % ways
    if pad == 0:
        return list(arrs), n
    out = []
    for a in arrs:
        out.append(jnp.concatenate([a] + [a[-1:]] * pad, axis=0))
    return out, n


def make_h264_decode_sharded(mesh, cfg: ShardingConfig, mbh: int, mbw: int,
                             deblock: bool = True):
    """Jitted SPMD decode: 16 symbol args [F,...] (F % mesh.size == 0) ->
    (Y, U, V) uint8 [F, 16*mbh, 16*mbw], frames sharded over all devices."""
    spec = _batch_spec(cfg)

    def step(*args):
        args = widen_symbol_args(list(args))
        return recon_tiles.decode_frames_batch(mbh, mbw, *args,
                                               deblock=deblock)

    sharded = _shard_map(step, mesh, (spec,) * _N_SYMBOL_ARGS,
                         (spec, spec, spec))
    return jax.jit(sharded)


def decode_symbols_sharded(fss, cfg: ShardingConfig = None, mesh=None,
                           deblock: bool = True):
    """List of same-geometry FrameSymbols -> (Y, U, V) numpy [F, h, w],
    decoded SPMD over the mesh (frames over all devices), bit-exact vs the
    single-device kernel."""
    if cfg is None:
        cfg = ShardingConfig.auto()
    if mesh is None:
        mesh = build_mesh(cfg)
    args = stack_symbols(fss)
    args, n = pad_batch(args, cfg.n_devices)
    fn = make_h264_decode_sharded(mesh, cfg, fss[0].mb_height,
                                  fss[0].mb_width, deblock=deblock)
    from .mesh import shard_batch
    sharded_args = [shard_batch(mesh, cfg, a) for a in args]
    Y, U, V = fn(*sharded_args)
    return np.asarray(Y)[:n], np.asarray(U)[:n], np.asarray(V)[:n]


def make_transcode_real_step(mesh, cfg: ShardingConfig, mbh: int, mbw: int,
                             qp_out: int = 30, deblock: bool = True):
    """The full-framework multichip step: REAL H.264 wavefront decode
    (frame-parallel over every chip) -> sp all_gather + row-band reshard ->
    halo-exchange downscale -> intra-encode forward pass -> psum rate stats.

    Returns a jitted fn(*symbol_args) -> (levels, bits, ssd); symbol args
    are sharded P(("dp","sp")) on the frame axis, levels come back sharded
    [F/dp over dp, rows over sp].
    """
    spec = _batch_spec(cfg)
    spec_lvl = P(cfg.axis_dp, cfg.axis_sp, None, None, None)
    spec_scalar = P()

    def step(*args):
        args = widen_symbol_args(list(args))
        Y, _, _ = recon_tiles.decode_frames_batch(mbh, mbw, *args,
                                                  deblock=deblock)
        # reshard frame-parallel -> row-parallel: gather sp's frames, keep
        # this shard's row band (local rows stay 8-divisible for downscale+
        # 4x4 grid; mbh*16 is divisible by any pow2 sp <= 16)
        Yg = jax.lax.all_gather(Y, cfg.axis_sp, axis=0, tiled=True)
        H = mbh * 16
        rows = H // cfg.sp  # static: slice sizes must be trace-time constants
        r0 = jax.lax.axis_index(cfg.axis_sp) * rows
        Yb = jax.lax.dynamic_slice_in_dim(Yg, r0, rows, axis=1)
        # spatial stage with sp halo exchange + global rate stats
        Ys = _downscale2x_with_halo(Yb.astype(jnp.int32), cfg.axis_sp)
        z, bits, ssd = _encode_forward(Ys, qp_out)
        gbits = jax.lax.psum(bits, (cfg.axis_dp, cfg.axis_sp))
        gssd = jax.lax.psum(ssd, (cfg.axis_dp, cfg.axis_sp))
        return z, gbits, gssd

    sharded = _shard_map(step, mesh, (spec,) * _N_SYMBOL_ARGS,
                         (spec_lvl, spec_scalar, spec_scalar))
    return jax.jit(sharded)


def _synthetic_symbols(mbh: int, mbw: int, n: int, qp: int = 30):
    """Valid intra FrameSymbols without needing a bitstream (for dryruns)."""
    from ..codec.h264.symbols import FrameSymbols
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        fs = FrameSymbols(mbw, mbh)
        fs.mb_class[:] = rng.integers(0, 2, (mbh, mbw))
        fs.qp[:] = qp
        fs.i4_modes[:] = 2
        fs.i16_mode[:] = 2
        fs.chroma_mode[:] = 0
        fs.luma_coeffs[:] = rng.integers(-8, 9, fs.luma_coeffs.shape)
        fs.luma_dc[:] = rng.integers(-16, 17, fs.luma_dc.shape)
        fs.chroma_coeffs[:] = rng.integers(-4, 5, fs.chroma_coeffs.shape)
        fs.chroma_dc[:] = rng.integers(-8, 9, fs.chroma_dc.shape)
        fs.fill_availability(np.zeros((mbh, mbw), np.int32))
        out.append(fs)
    return out


def run_decode_sharded_dryrun(n_devices: int, mbh: int = 4, mbw: int = 4):
    """Driver dryrun: jit + run ONE full sharded step (real wavefront decode,
    all_gather reshard, ppermute halo downscale, psum stats) on tiny shapes
    over an n_devices mesh."""
    cfg = ShardingConfig.auto(n_devices)
    mesh = build_mesh(cfg)
    # rows after downscale must tile 4x4 per sp shard: mbh*16/(2*sp) % 4 == 0
    mbh = max(mbh, cfg.sp)
    fss = _synthetic_symbols(mbh, mbw, n=max(2 * n_devices, 4))
    args = stack_symbols(fss)
    args, _ = pad_batch(args, cfg.n_devices)
    step = make_transcode_real_step(mesh, cfg, mbh, mbw)
    from .mesh import shard_batch
    sargs = [shard_batch(mesh, cfg, a) for a in args]
    z, bits, ssd = step(*sargs)
    jax.block_until_ready(z)
    return np.asarray(z), int(bits), int(ssd), cfg
