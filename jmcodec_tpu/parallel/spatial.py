"""True spatial (CTU-row) sharding of the REAL H.264 wavefront decode
(SURVEY §2.3 ③/④): one frame's MB rows banded across chips.

The diagonal-tile wavefront's only cross-lane (cross-row) dataflow is a
lane roll of the carry rings (top/top-right/top-left neighbor tiles). Under
a row-sharded shard_map those rolls become a ppermute ring of ONE boundary
lane per step (kernels/recon_tiles._roll_lanes) — the halo exchange rides
ICI while each chip reconstructs its own row band. Deblocking (which also
reads the row above) uses the same mechanism.

Bit-exactness vs the single-device kernel is asserted on the virtual CPU
mesh by tests/test_spatial.py; the driver's dryrun compiles and runs this
path over (dp, sp) with a real bitstream.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from ..kernels import recon_tiles as RT
from .decode_sharded import _shard_map
from .mesh import ShardingConfig, build_mesh


def _row_sharded_scan(mesh, axis: str, mbh_local: int, deblock: bool):
    """shard_map'd intra + deblock scans over lane-sharded skewed tiles."""

    def part(resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t, i16_t,
             cmode_t, a_l_t, a_t_t, a_tr_t, valid_t, qp_t, mxs_t, mys_t,
             alpha_off, beta_off, cq_off, cq2_off):
        with RT.lane_axis(axis):
            Yt, Ut, Vt = RT._intra_tile_scan(
                resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t, i16_t,
                cmode_t, a_l_t, a_t_t, a_tr_t, valid_t, mbh_local)
            if deblock:
                Yt, Ut, Vt = RT._deblock_tile_scan_intra(
                    Yt, Ut, Vt, qp_t, mxs_t, mys_t, valid_t, mbh_local,
                    alpha_off, beta_off, cq_off, cq2_off)
        return Yt, Ut, Vt

    lane = P(None, axis)           # [steps, B, ...] sharded on lanes
    spec_in = (lane,) * 14 + (P(), P(), P(), P())
    return _shard_map(part, mesh, spec_in, (lane, lane, lane))


@functools.lru_cache(maxsize=8)
def _make_decode_rows(mesh, axis: str, n_sp: int, mbh: int, mbw: int,
                      deblock: bool):
    """Jitted row-sharded decode for one geometry (mesh is hashable)."""
    scan = _row_sharded_scan(mesh, axis, mbh // n_sp, deblock)

    @jax.jit
    def run(mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
            luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
            avail_topright, alpha_off, beta_off, cq_off, cq2_off):
        (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
         luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
         avail_topright) = [
            a.astype(jnp.int32) for a in
            (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
             luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
             avail_topright)]
        mys, mxs, valid = RT._skew_geometry(mbh, mbw)
        mys_j, mxs_j = jnp.asarray(mys), jnp.asarray(mxs)
        valid_j = jnp.asarray(valid)

        resid_y, resid_u, resid_v = RT._residuals(
            luma_coeffs, luma_dc, chroma_coeffs, chroma_dc, qp, mb_class,
            cq_off, cq2_off)

        sk = lambda p, s: RT._skew(RT._to_tiles(p, mbh, mbw, s),
                                   mys_j, mxs_j)
        modes_mb = i4_modes.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3)
        Yt, Ut, Vt = scan(
            sk(resid_y, 4), sk(resid_u, 2), sk(resid_v, 2),
            RT._skew(modes_mb, mys_j, mxs_j),
            RT._skew(mb_class, mys_j, mxs_j),
            RT._skew(i16_mode, mys_j, mxs_j),
            RT._skew(chroma_mode, mys_j, mxs_j),
            RT._skew(avail_left, mys_j, mxs_j),
            RT._skew(avail_top, mys_j, mxs_j),
            RT._skew(avail_topright, mys_j, mxs_j),
            valid_j, RT._skew(qp, mys_j, mxs_j), mxs_j, mys_j,
            alpha_off, beta_off, cq_off, cq2_off)
        Y = RT._unskew_to_frame(Yt, mys_j, mxs_j, valid_j, mbh, mbw, 16)
        U = RT._unskew_to_frame(Ut, mys_j, mxs_j, valid_j, mbh, mbw, 8)
        V = RT._unskew_to_frame(Vt, mys_j, mxs_j, valid_j, mbh, mbw, 8)
        return (Y.astype(jnp.uint8), U.astype(jnp.uint8),
                V.astype(jnp.uint8))
    return run


def decode_frame_rows_sharded(fs, mesh=None, cfg: ShardingConfig = None,
                              deblock=None):
    """Decode ONE intra frame with its MB rows banded over the sp axis:
    the wavefront recon and deblock both run spatially sharded with
    ppermute halo exchange. Returns (Y, U, V) numpy, bit-exact vs the
    single-device kernel."""
    if cfg is None:
        cfg = ShardingConfig.auto()
    if mesh is None:
        mesh = build_mesh(cfg)
    if deblock is None:
        deblock = fs.deblock_enabled
    if fs.mb_height % cfg.sp:
        raise ValueError(f"mb_height {fs.mb_height} not divisible by "
                         f"sp={cfg.sp}")
    run = _make_decode_rows(mesh, cfg.axis_sp, cfg.sp, fs.mb_height,
                            fs.mb_width, bool(deblock))
    out = run(
        jnp.asarray(fs.mb_class), jnp.asarray(fs.qp),
        jnp.asarray(fs.i4_modes), jnp.asarray(fs.i16_mode),
        jnp.asarray(fs.chroma_mode), jnp.asarray(fs.luma_coeffs),
        jnp.asarray(fs.luma_dc), jnp.asarray(fs.chroma_coeffs),
        jnp.asarray(fs.chroma_dc), jnp.asarray(fs.avail_left),
        jnp.asarray(fs.avail_top), jnp.asarray(fs.avail_topright),
        jnp.int32(fs.alpha_off), jnp.int32(fs.beta_off),
        jnp.int32(fs.chroma_qp_off), jnp.int32(fs.second_chroma_qp_off))
    return tuple(np.asarray(p) for p in out)
