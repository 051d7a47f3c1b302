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


# ---------------------------------------------------------------------------
# inter (P) pictures: MC with cross-shard reference-window exchange
# (SURVEY §2.3 ④ — the codec analog of context parallelism's KV exchange)
# ---------------------------------------------------------------------------


def _halo_rows(band, axis: str, halo: int):
    """band [n, h_loc, W] row-sharded on `axis` -> [n, halo+h_loc+halo, W]:
    real neighbour rows arrive via a ppermute ring; the frame's top/bottom
    shards edge-replicate their own border row (matching the global
    edge-padded reference plane)."""
    sp = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    out_parts = []
    if sp > 1:
        down = [(s, s + 1) for s in range(sp - 1)]
        up = [(s + 1, s) for s in range(sp - 1)]
        from_above = jax.lax.ppermute(band[:, -halo:], axis, down)
        from_below = jax.lax.ppermute(band[:, :halo], axis, up)
    else:
        from_above = jnp.zeros_like(band[:, :halo])
        from_below = jnp.zeros_like(band[:, :halo])
    edge_top = jnp.repeat(band[:, :1], halo, axis=1)
    edge_bot = jnp.repeat(band[:, -1:], halo, axis=1)
    from_above = jnp.where(i == 0, edge_top, from_above)
    from_below = jnp.where(i == sp - 1, edge_bot, from_below)
    return jnp.concatenate([from_above, band, from_below], axis=1)


def _mc_rows_sharded(mesh, axis: str, mbh: int, mbw: int, n_sp: int,
                     has_wp: bool = False):
    """shard_map'd motion compensation over MB-row bands: each shard MCs
    its own rows against a reference WINDOW = its ref band + MC_PAD rows
    of halo ppermuted from the neighbouring shards. Bit-exact vs the
    whole-frame MC for |mvy| <= 4*(MC_PAD-8) (the same pad budget the
    unsharded kernel's clamp allows)."""
    hb = (mbh // n_sp) * 16          # luma band height (pixels)

    def part(ref_y, ref_u, ref_v, mv, ref_idx, wp, wp_logwd):
        i = jax.lax.axis_index(axis)
        P_ = RT.MC_PAD
        # luma: halo rows + x edge padding (y edge comes from the halo)
        ry = _halo_rows(ref_y, axis, P_)
        ry = jnp.pad(ry, ((0, 0), (0, 0), (P_, P_)), mode="edge")
        Hp_g = mbh * 16 + 2 * P_
        clip_y = (3 - i * hb, Hp_g - 8 - i * hb)
        mc_y = RT._mc_luma_batched(ry.astype(jnp.int32), mv, ref_idx,
                                   mbh, mbw, clip_y=clip_y)
        Pc = P_ // 2
        Hc_g = mbh * 8 + 2 * Pc
        clip_c = (0 - i * (hb // 2), Hc_g - 4 - i * (hb // 2))
        ru = _halo_rows(ref_u, axis, Pc)
        ru = jnp.pad(ru, ((0, 0), (0, 0), (Pc, Pc)), mode="edge")
        rv = _halo_rows(ref_v, axis, Pc)
        rv = jnp.pad(rv, ((0, 0), (0, 0), (Pc, Pc)), mode="edge")
        mc_u = RT._mc_chroma_batched(ru.astype(jnp.int32), mv, ref_idx,
                                     mbh, mbw, clip_y=clip_c)
        mc_v = RT._mc_chroma_batched(rv.astype(jnp.int32), mv, ref_idx,
                                     mbh, mbw, clip_y=clip_c)
        if has_wp:
            wpj = wp.astype(jnp.int32)
            rw = jnp.clip(ref_idx, 0, wpj.shape[0] - 1)

            def w_apply(mc, wi, oi, ld):
                w = wpj[rw, wi][..., None, None]
                o = wpj[rw, oi][..., None, None]
                rnd = jnp.where(ld >= 1, 1 << jnp.maximum(ld - 1, 0), 0)
                return jnp.clip(
                    ((mc * w + rnd) >> jnp.maximum(ld, 0)) + o, 0, 255)

            mc_y = w_apply(mc_y, 0, 1, wp_logwd[0].astype(jnp.int32))
            mc_u = w_apply(mc_u, 2, 3, wp_logwd[1].astype(jnp.int32))
            mc_v = w_apply(mc_v, 4, 5, wp_logwd[1].astype(jnp.int32))
        return mc_y, mc_u, mc_v

    rows = P(None, axis)     # [n_refs, H, W] sharded on rows
    grid = P(axis)           # [gh, gw, ...] sharded on rows
    return _shard_map(part, mesh,
                      (rows, rows, rows, grid, grid, P(), P()),
                      (grid, grid, grid))


def _row_sharded_scan_inter(mesh, axis: str, mbh_local: int, deblock: bool):
    """shard_map'd intra + bS-driven deblock scans with inter-seeded
    tiles (P pictures): same halo mechanism as the intra variant."""

    def part(resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t, i16_t,
             cmode_t, a_l_t, a_t_t, a_tr_t, valid_t, qp_t, mxs_t, mys_t,
             inter_y_t, inter_u_t, inter_v_t, bsv_t, bsh_t,
             alpha_off, beta_off, cq_off, cq2_off):
        with RT.lane_axis(axis):
            Yt, Ut, Vt = RT._intra_tile_scan(
                resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t, i16_t,
                cmode_t, a_l_t, a_t_t, a_tr_t, valid_t, mbh_local,
                inter_y_t, inter_u_t, inter_v_t)
            if deblock:
                Yt, Ut, Vt = RT._deblock_tile_scan(
                    Yt, Ut, Vt, qp_t, mxs_t, mys_t, valid_t, mbh_local,
                    alpha_off, beta_off, cq_off, cq2_off, bsv_t, bsh_t)
        return Yt, Ut, Vt

    lane = P(None, axis)
    spec_in = (lane,) * 19 + (P(), P(), P(), P())
    return _shard_map(part, mesh, spec_in, (lane, lane, lane))


@functools.lru_cache(maxsize=8)
def _make_decode_rows_inter(mesh, axis: str, n_sp: int, mbh: int, mbw: int,
                            deblock: bool, has_wp: bool):
    mc = _mc_rows_sharded(mesh, axis, mbh, mbw, n_sp, has_wp)
    scan = _row_sharded_scan_inter(mesh, axis, mbh // n_sp, deblock)

    @jax.jit
    def run(mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
            luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
            avail_topright, alpha_off, beta_off, cq_off, cq2_off,
            mv, ref_idx, ref_y, ref_u, ref_v, wp, wp_logwd, ref_ids):
        (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
         luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
         avail_topright, mv, ref_idx) = [
            a.astype(jnp.int32) for a in
            (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
             luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
             avail_topright, mv, ref_idx)]
        mys, mxs, valid = RT._skew_geometry(mbh, mbw)
        mys_j, mxs_j = jnp.asarray(mys), jnp.asarray(mxs)
        valid_j = jnp.asarray(valid)

        mc_y, mc_u, mc_v = mc(ref_y, ref_u, ref_v, mv, ref_idx,
                              wp, wp_logwd)
        resid_y, resid_u, resid_v = RT._residuals(
            luma_coeffs, luma_dc, chroma_coeffs, chroma_dc, qp, mb_class,
            cq_off, cq2_off)
        # inter recon = clip(MC + residual) assembled as planes
        def c_plane_from22(m):
            gh, gw = m.shape[0], m.shape[1]
            return m.transpose(0, 2, 1, 3).reshape(gh * 2, gw * 2)

        def y_plane_from44(m):
            gh, gw = m.shape[0], m.shape[1]
            return m.transpose(0, 2, 1, 3).reshape(gh * 4, gw * 4)

        # luma residuals stay in [gh, gw, 4, 4] block form (like
        # _decode_core); chroma assembles planes for the 8x8 MB tiles
        rec_y = jnp.clip(mc_y + resid_y, 0, 255)
        rec_u = jnp.clip(c_plane_from22(mc_u)
                         + y_plane_from44(resid_u), 0, 255)
        rec_v = jnp.clip(c_plane_from22(mc_v)
                         + y_plane_from44(resid_v), 0, 255)

        sk = lambda p, s: RT._skew(RT._to_tiles(p, mbh, mbw, s),
                                   mys_j, mxs_j)
        inter_y_t = sk(rec_y, 4)
        cu = rec_u.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3)
        cv = rec_v.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3)
        inter_u_t = RT._skew(cu, mys_j, mxs_j)
        inter_v_t = RT._skew(cv, mys_j, mxs_j)

        nz_blk = jnp.any(luma_coeffs != 0, axis=(-1, -2)).astype(jnp.int32)
        bs_v, bs_h = RT._bs_planes(mb_class, nz_blk, mv, ref_idx, ref_ids)
        bsv_mb = bs_v.reshape(mbh, 4, mbw, 4).transpose(0, 2, 3, 1)
        bsh_mb = bs_h.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3)

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
            inter_y_t, inter_u_t, inter_v_t,
            RT._skew(bsv_mb, mys_j, mxs_j),
            RT._skew(bsh_mb, mys_j, mxs_j),
            alpha_off, beta_off, cq_off, cq2_off)
        Y = RT._unskew_to_frame(Yt, mys_j, mxs_j, valid_j, mbh, mbw, 16)
        U = RT._unskew_to_frame(Ut, mys_j, mxs_j, valid_j, mbh, mbw, 8)
        V = RT._unskew_to_frame(Vt, mys_j, mxs_j, valid_j, mbh, mbw, 8)
        return (Y.astype(jnp.uint8), U.astype(jnp.uint8),
                V.astype(jnp.uint8))
    return run


def decode_frame_rows_sharded_inter(fs, refs, mesh=None,
                                    cfg: ShardingConfig = None,
                                    deblock=None, ref_ids=None):
    """Decode ONE P frame with MB rows banded over sp: motion compensation
    reads each shard's reference band plus MC_PAD halo rows ppermuted from
    its neighbours (the §2.3 ④ reference-window exchange), then the intra
    wavefront + bS deblock run row-sharded like the intra path. refs:
    [(Yp, Up, Vp) padded planes] in list0 order (pad_ref_device layout).
    Bit-exact vs decode_frame_symbols_inter for |mvy| <= 4*(MC_PAD-8)."""
    if cfg is None:
        cfg = ShardingConfig.auto()
    if mesh is None:
        mesh = build_mesh(cfg)
    if deblock is None:
        deblock = fs.deblock_enabled
    if fs.mb_height % cfg.sp:
        raise ValueError(f"mb_height {fs.mb_height} not divisible by "
                         f"sp={cfg.sp}")
    if (fs.mb_height // cfg.sp) * 16 < RT.MC_PAD:
        raise NotImplementedError(
            "row band shorter than the one-hop halo (MC_PAD rows)")
    if int(np.max(np.abs(np.asarray(fs.mv)[..., 1]))) > 4 * (RT.MC_PAD - 8):
        raise NotImplementedError("vertical MV beyond the halo budget")
    run = _make_decode_rows_inter(mesh, cfg.axis_sp, cfg.sp, fs.mb_height,
                                  fs.mb_width, bool(deblock),
                                  fs.wp is not None)
    ref_y = jnp.stack([r[0] for r in refs])
    ref_u = jnp.stack([r[1] for r in refs])
    ref_v = jnp.stack([r[2] for r in refs])
    # refs arrive padded (pad_ref_device); strip to the raw planes — the
    # sharded MC rebuilds x padding locally and y padding via the halo
    P_ = RT.MC_PAD
    ref_y = ref_y[:, P_:-P_, P_:-P_]
    ref_u = ref_u[:, P_ // 2:-P_ // 2, P_ // 2:-P_ // 2]
    ref_v = ref_v[:, P_ // 2:-P_ // 2, P_ // 2:-P_ // 2]
    out = run(
        jnp.asarray(fs.mb_class), jnp.asarray(fs.qp),
        jnp.asarray(fs.i4_modes), jnp.asarray(fs.i16_mode),
        jnp.asarray(fs.chroma_mode), jnp.asarray(fs.luma_coeffs),
        jnp.asarray(fs.luma_dc), jnp.asarray(fs.chroma_coeffs),
        jnp.asarray(fs.chroma_dc), jnp.asarray(fs.avail_left),
        jnp.asarray(fs.avail_top), jnp.asarray(fs.avail_topright),
        jnp.int32(fs.alpha_off), jnp.int32(fs.beta_off),
        jnp.int32(fs.chroma_qp_off), jnp.int32(fs.second_chroma_qp_off),
        jnp.asarray(fs.mv), jnp.asarray(fs.ref), ref_y, ref_u, ref_v,
        jnp.zeros((1, 6), jnp.int32) if fs.wp is None
        else jnp.asarray(fs.wp),
        jnp.zeros((2,), jnp.int32) if fs.wp is None
        else jnp.asarray(fs.wp_logwd, jnp.int32),
        (jnp.arange(len(refs), dtype=jnp.int32) if ref_ids is None
         else jnp.asarray(ref_ids, jnp.int32)))
    return tuple(np.asarray(p) for p in out)
