"""Diagonal-tile device reconstruction — the performance path.

The first-cut kernel (kernels/recon.py) kept the frame as one 2D buffer and
scattered每 wavefront batch into it; TPU lowers those gathers/scatters poorly
(~ms per scan step). Here the frame lives in SKEWED TILE space instead:

    MB (my, mx) -> diagonal d = mx + 2*my, lane k = my
    tiles[d] : [bmax, 16, 16]  — all MBs of one wavefront, contiguous

Neighbor MBs of (d, k) are (d-1, k) = left, (d-2, k-1) = top,
(d-1, k-1) = top-right, (d-3, k-1) = top-left — i.e. recent diagonals with a
static lane roll. The intra scan therefore carries only the last 3 diagonals
and emits each finished diagonal through scan's ys; every memory access is a
static slice or a lane roll. The deblock pass uses the same structure with a
2-diagonal lag (a tile is final once its right and bottom neighbors have
filtered their shared edges).

Bit-exact vs the numpy reference decoder (same invariants as recon.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.h264 import macroblock as MB
from ..ops import deblock as DB
from ..ops import intra as IP
from ..ops import transform as T
from .recon import _residuals, wavefront_schedule


# ---------------------------------------------------------------------------
# skew helpers (static per geometry)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _skew_geometry(mbh: int, mbw: int):
    """Tile schedule with lane == my (so the top/topright neighbor of lane k
    is always lane k-1 of an earlier diagonal — a static roll)."""
    n_steps = mbw + 2 * (mbh - 1)
    ks = np.arange(mbh)
    mys = np.broadcast_to(ks[None, :], (n_steps, mbh)).astype(np.int32)
    mxs = (np.arange(n_steps)[:, None] - 2 * ks[None, :]).astype(np.int32)
    valid = ((mxs >= 0) & (mxs < mbw)).astype(np.int32)
    mxs = np.clip(mxs, 0, mbw - 1)
    return mys, mxs, valid  # [n_steps, mbh]


def _to_tiles(plane_blocks, mbh, mbw, sub):
    """[mbh*s, mbw*s, 4, 4] block array -> [mbh, mbw, 4s, 4s] MB tiles."""
    s = sub
    return plane_blocks.reshape(mbh, s, mbw, s, 4, 4) \
        .transpose(0, 2, 1, 4, 3, 5).reshape(mbh, mbw, 4 * s, 4 * s)


def _skew(arr_mb, mys, mxs):
    """[mbh, mbw, ...] -> [n_steps, bmax, ...] (single gather, outside scan)."""
    return arr_mb[mys, mxs]


def _unskew_to_frame(tiles, mys, mxs, valid, mbh, mbw, ts):
    """[n_steps, bmax, ts, ts] -> [mbh*ts, mbw*ts] (single scatter; invalid
    lanes are routed out of range and dropped)."""
    flat = jnp.where(valid == 1, mys * mbw + mxs, mbh * mbw).reshape(-1)
    frame = jnp.zeros((mbh * mbw, ts, ts), tiles.dtype)
    frame = frame.at[flat].set(tiles.reshape(-1, ts, ts), mode="drop")
    return frame.reshape(mbh, mbw, ts, ts).transpose(0, 2, 1, 3) \
        .reshape(mbh * ts, mbw * ts)


# ---------------------------------------------------------------------------
# intra prediction batches (shared with recon.py formulations)
# ---------------------------------------------------------------------------

from .recon import _pred_16_batch, _pred_chroma_batch, _pred_i4_batch, _TR_SRC


def _intra_tile_scan(resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t,
                     i16_t, cmode_t, a_l_t, a_t_t, a_tr_t, valid_t, bmax):
    """Scan over diagonals; returns (Y_tiles, U_tiles, V_tiles) skewed."""

    def roll1(x):
        return jnp.roll(x, 1, axis=0)

    def body(carry, xs):
        (P1y, P2y, P3y, P1u, P2u, P3u, P1v, P2v, P3v) = carry
        (resid, resid_u, resid_v, modes, cls, i16m, cmode,
         a_l, a_t, a_tr, valid) = xs
        act = valid == 1
        a_l = (a_l == 1)
        a_t = (a_t == 1)
        a_tr = (a_tr == 1)

        Ttile = roll1(P2y)          # top MB tile per lane
        TRrow = roll1(P1y)[:, 15, :]   # top-right MB's bottom row
        TLcorner = roll1(P3y)[:, 15, 15]
        top_row = Ttile[:, 15, :]      # [B,16]
        left_col = P1y[:, :, 15]       # [B,16]

        R = jnp.zeros_like(P1y)
        # ---- I4x4: 16 static sub-blocks ----
        for i in range(16):
            bx4, by4 = int(MB.BLK_X[i]), int(MB.BLK_Y[i])
            bt = a_t if by4 == 0 else jnp.full_like(a_t, True)
            bl = a_l if bx4 == 0 else jnp.full_like(a_l, True)
            src = _TR_SRC[i]
            if src == 0:
                btr = jnp.full_like(a_t, True)
            elif src == 1:
                btr = a_t
            elif src == 2:
                btr = a_tr
            else:
                btr = jnp.full_like(a_t, False)
            # t8
            if by4 == 0:
                t04 = top_row[:, bx4:bx4 + 4]
                if bx4 < 12:
                    t47 = top_row[:, bx4 + 4:bx4 + 8]
                else:
                    t47 = TRrow[:, 0:4]
            else:
                t04 = R[:, by4 - 1, bx4:bx4 + 4]
                if bx4 < 12:
                    t47 = R[:, by4 - 1, bx4 + 4:bx4 + 8]
                else:
                    t47 = R[:, by4 - 1, 12:16]  # dummy; TR unavailable here
            t8 = jnp.concatenate([t04, t47], axis=1)
            t8 = jnp.where(bt[:, None], t8, 0)
            t8 = t8.at[:, 4:].set(
                jnp.where((bt & btr)[:, None], t8[:, 4:], t8[:, 3:4]))
            # l4
            if bx4 == 0:
                l4 = left_col[:, by4:by4 + 4]
            else:
                l4 = R[:, by4:by4 + 4, bx4 - 1]
            l4 = jnp.where(bl[:, None], l4, 0)
            # tl
            if bx4 == 0 and by4 == 0:
                tl = TLcorner
            elif by4 == 0:
                tl = top_row[:, bx4 - 1]
            elif bx4 == 0:
                tl = left_col[:, by4 - 1]
            else:
                tl = R[:, by4 - 1, bx4 - 1]
            tl = jnp.where(bt & bl, tl, 0)
            n = jnp.concatenate([l4[:, ::-1], tl[:, None], t8], axis=1)
            pred = _pred_i4_batch(n, modes[:, by4 // 4, bx4 // 4], bt, bl)
            rec = jnp.clip(pred + resid[:, by4:by4 + 4, bx4:bx4 + 4], 0, 255)
            R = R.at[:, by4:by4 + 4, bx4:bx4 + 4].set(rec)

        # ---- I16x16 ----
        t16 = jnp.where(a_t[:, None], top_row, 0)
        l16 = jnp.where(a_l[:, None], left_col, 0)
        tl16 = jnp.where(a_t & a_l, TLcorner, 0)
        pred16 = _pred_16_batch(t16, l16, tl16, i16m, a_t, a_l)
        rec16 = jnp.clip(pred16 + resid, 0, 255)
        Rfin = jnp.where((cls == 1)[:, None, None], rec16, R)
        Rfin = jnp.where(act[:, None, None], Rfin, 0)

        # ---- chroma ----
        outs_c = []
        for (P1c, P2c, P3c, residc) in ((P1u, P2u, P3u, resid_u),
                                        (P1v, P2v, P3v, resid_v)):
            top_c = roll1(P2c)[:, 7, :]
            left_c = P1c[:, :, 7]
            tl_c = roll1(P3c)[:, 7, 7]
            t8c = jnp.where(a_t[:, None], top_c, 0)
            l8c = jnp.where(a_l[:, None], left_c, 0)
            tlc = jnp.where(a_t & a_l, tl_c, 0)
            predc = _pred_chroma_batch(t8c, l8c, tlc, cmode, a_t, a_l)
            recc = jnp.clip(predc + residc, 0, 255)
            outs_c.append(jnp.where(act[:, None, None], recc, 0))

        new_carry = (Rfin, P1y, P2y, outs_c[0], P1u, P2u,
                     outs_c[1], P1v, P2v)
        return new_carry, (Rfin, outs_c[0], outs_c[1])

    z16 = jnp.zeros((bmax, 16, 16), jnp.int32)
    z8 = jnp.zeros((bmax, 8, 8), jnp.int32)
    carry0 = (z16, z16, z16, z8, z8, z8, z8, z8, z8)
    _, ys = jax.lax.scan(body, carry0,
                         (resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t,
                          i16_t, cmode_t, a_l_t, a_t_t, a_tr_t, valid_t))
    return ys


# ---------------------------------------------------------------------------
# deblocking in tile space
# ---------------------------------------------------------------------------

def _edge_v_luma(Pcols, Qcols, bs, ia, ib, tabs):
    """Vertical edge between p-side [B,16,4] (cols p3..p0) and q-side
    [B,16,4] (q0..q3). Returns updated (P', Q')."""
    alpha_t, beta_t, tc0_t = tabs
    samples = [Pcols[:, :, k] for k in range(4)] + \
              [Qcols[:, :, k] for k in range(4)]
    res = DB._filter_edge_luma(*samples, bs, ia, ib, xp=jnp,
                               alpha_t=alpha_t, beta_t=beta_t, tc0_t=tc0_t)
    return jnp.stack(res[:4], axis=2), jnp.stack(res[4:], axis=2)


def _edge_h_luma(Prows, Qrows, bs, ia, ib, tabs):
    alpha_t, beta_t, tc0_t = tabs
    samples = [Prows[:, k, :] for k in range(4)] + \
              [Qrows[:, k, :] for k in range(4)]
    res = DB._filter_edge_luma(*samples, bs, ia, ib, xp=jnp,
                               alpha_t=alpha_t, beta_t=beta_t, tc0_t=tc0_t)
    return jnp.stack(res[:4], axis=1), jnp.stack(res[4:], axis=1)


def _edge_v_chroma(Pc, Qc, bs, ia, ib, tabs):
    alpha_t, beta_t, tc0_t = tabs
    p0n, q0n = DB._filter_edge_chroma(Pc[:, :, 0], Pc[:, :, 1],
                                      Qc[:, :, 0], Qc[:, :, 1], bs, ia, ib,
                                      xp=jnp, alpha_t=alpha_t, beta_t=beta_t,
                                      tc0_t=tc0_t)
    return (jnp.stack([Pc[:, :, 0], p0n], axis=2),
            jnp.stack([q0n, Qc[:, :, 1]], axis=2))


def _edge_h_chroma(Pc, Qc, bs, ia, ib, tabs):
    alpha_t, beta_t, tc0_t = tabs
    p0n, q0n = DB._filter_edge_chroma(Pc[:, 0, :], Pc[:, 1, :],
                                      Qc[:, 0, :], Qc[:, 1, :], bs, ia, ib,
                                      xp=jnp, alpha_t=alpha_t, beta_t=beta_t,
                                      tc0_t=tc0_t)
    return (jnp.stack([Pc[:, 0, :], p0n], axis=1),
            jnp.stack([q0n, Qc[:, 1, :]], axis=1))


def _deblock_tile_scan(Yt, Ut, Vt, qp_t, mxs_t, mys_t, valid_t, bmax,
                       alpha_off, beta_off, chroma_qp_off,
                       second_chroma_qp_off):
    """Yt/Ut/Vt: skewed recon tiles [n_steps, bmax, ...]; returns same-shape
    deblocked tiles (diagonal d emitted at scan step d+2)."""
    n_steps = Yt.shape[0]
    alpha_t = jnp.asarray(DB.ALPHA_TABLE)
    beta_t = jnp.asarray(DB.BETA_TABLE)
    tc0_t = jnp.asarray(DB.TC0_TABLE).reshape(-1)
    tabs = (alpha_t, beta_t, tc0_t)
    cqt = jnp.asarray(T.CHROMA_QP)

    pad3 = lambda x, z: jnp.concatenate([x, jnp.broadcast_to(z, (2,) + x.shape[1:])])
    Yt_x = pad3(Yt, jnp.zeros_like(Yt[0]))
    Ut_x = pad3(Ut, jnp.zeros_like(Ut[0]))
    Vt_x = pad3(Vt, jnp.zeros_like(Vt[0]))
    qp_x = pad3(qp_t, jnp.zeros_like(qp_t[0]))
    mxs_x = pad3(mxs_t, jnp.zeros_like(mxs_t[0]))
    mys_x = pad3(mys_t, jnp.zeros_like(mys_t[0]))
    val_x = pad3(valid_t, jnp.zeros_like(valid_t[0]))

    def qav(qa, qb):
        return (qa + qb + 1) >> 1

    def body(carry, xs):
        (Ay, Au, Av, By, Bu, Bv, qA, qB, vA, vB) = carry
        (R, Ru, Rv, qp, mxs, mys, valid) = xs
        act = valid == 1
        roll1 = lambda x: jnp.roll(x, 1, axis=0)

        q_left = qA
        q_top = roll1(qB)
        top_ok = act & (mys > 0) & (roll1(vB) == 1)
        left_ok = act & (mxs > 0) & (vA == 1)

        # ---------- luma vertical edges ----------
        # edge 0 (MB boundary, bs=4) between A (left) and R
        qa0 = qav(qp, q_left)
        ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
        ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
        bs0 = jnp.where(left_ok, 4, 0)[:, None]
        Pn, Qn = _edge_v_luma(Ay[:, :, 12:16], R[:, :, 0:4], bs0, ia0, ib0, tabs)
        Ay = Ay.at[:, :, 12:16].set(Pn)
        R = R.at[:, :, 0:4].set(Qn)
        # internal edges bs=3
        ia = jnp.clip(qp + alpha_off, 0, 51)[:, None]
        ib = jnp.clip(qp + beta_off, 0, 51)[:, None]
        bs3 = jnp.where(act, 3, 0)[:, None]
        for e in (1, 2, 3):
            x = 4 * e
            Pn, Qn = _edge_v_luma(R[:, :, x - 4:x], R[:, :, x:x + 4],
                                  bs3, ia, ib, tabs)
            R = R.at[:, :, x - 4:x].set(Pn)
            R = R.at[:, :, x:x + 4].set(Qn)

        # ---------- luma horizontal edges ----------
        Tt = roll1(By)
        qa0 = qav(qp, q_top)
        ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
        ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
        bs0 = jnp.where(top_ok, 4, 0)[:, None]
        Pn, Qn = _edge_h_luma(Tt[:, 12:16, :], R[:, 0:4, :], bs0, ia0, ib0, tabs)
        Tt = Tt.at[:, 12:16, :].set(Pn)
        R = R.at[:, 0:4, :].set(Qn)
        By = jnp.roll(Tt, -1, axis=0)
        for e in (1, 2, 3):
            y = 4 * e
            Pn, Qn = _edge_h_luma(R[:, y - 4:y, :], R[:, y:y + 4, :],
                                  bs3, ia, ib, tabs)
            R = R.at[:, y - 4:y, :].set(Pn)
            R = R.at[:, y:y + 4, :].set(Qn)

        # ---------- chroma ----------
        new_c = []
        for (Ac, Bc, Rc, off) in ((Au, Bu, Ru, chroma_qp_off),
                                  (Av, Bv, Rv, second_chroma_qp_off)):
            qc = cqt[jnp.clip(qp + off, 0, 51)]
            qc_l = cqt[jnp.clip(q_left + off, 0, 51)]
            qc_t = cqt[jnp.clip(q_top + off, 0, 51)]
            # vertical edge 0 (bs=4) and internal (cx=4, bs=3)
            qa0 = qav(qc, qc_l)
            ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
            ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
            Pn, Qn = _edge_v_chroma(Ac[:, :, 6:8], Rc[:, :, 0:2],
                                    jnp.where(left_ok, 4, 0)[:, None],
                                    ia0, ib0, tabs)
            Ac = Ac.at[:, :, 6:8].set(Pn)
            Rc = Rc.at[:, :, 0:2].set(Qn)
            iac = jnp.clip(qc + alpha_off, 0, 51)[:, None]
            ibc = jnp.clip(qc + beta_off, 0, 51)[:, None]
            Pn, Qn = _edge_v_chroma(Rc[:, :, 2:4], Rc[:, :, 4:6],
                                    bs3, iac, ibc, tabs)
            Rc = Rc.at[:, :, 2:4].set(Pn)
            Rc = Rc.at[:, :, 4:6].set(Qn)
            # horizontal edges
            Tc = roll1(Bc)
            qa0 = qav(qc, qc_t)
            ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
            ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
            Pn, Qn = _edge_h_chroma(Tc[:, 6:8, :], Rc[:, 0:2, :],
                                    jnp.where(top_ok, 4, 0)[:, None],
                                    ia0, ib0, tabs)
            Tc = Tc.at[:, 6:8, :].set(Pn)
            Rc = Rc.at[:, 0:2, :].set(Qn)
            Bc = jnp.roll(Tc, -1, axis=0)
            Pn, Qn = _edge_h_chroma(Rc[:, 2:4, :], Rc[:, 4:6, :],
                                    bs3, iac, ibc, tabs)
            Rc = Rc.at[:, 2:4, :].set(Pn)
            Rc = Rc.at[:, 4:6, :].set(Qn)
            new_c.append((Rc, Ac, Bc))

        (Ru2, Au2, Bu2), (Rv2, Av2, Bv2) = new_c
        # emit the now-final diagonal t-2; shift the window:
        #   A_next = current diagonal, B_next = old A (updated by our V edge 0)
        ys = (By, Bu2, Bv2)
        new_carry = (R, Ru2, Rv2, Ay, Au2, Av2,
                     qp, qA, act.astype(jnp.int32), vA)
        return new_carry, ys

    # carry layout: (Ay, Au, Av, By, Bu, Bv, qA, qB, vA, vB)
    # with A = diagonal t-1, B = diagonal t-2
    z16 = jnp.zeros((bmax, 16, 16), jnp.int32)
    z8 = jnp.zeros((bmax, 8, 8), jnp.int32)
    zq = jnp.zeros((bmax,), jnp.int32)
    carry0 = (z16, z8, z8, z16, z8, z8, zq, zq, zq, zq)
    _, ys = jax.lax.scan(body, carry0,
                         (Yt_x, Ut_x, Vt_x, qp_x, mxs_x, mys_x, val_x))
    Yd, Ud, Vd = ys
    return Yd[2:], Ud[2:], Vd[2:]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "deblock"))
def decode_frame(mbh: int, mbw: int, mb_class, qp, i4_modes, i16_mode,
                 chroma_mode, luma_coeffs, luma_dc, chroma_coeffs, chroma_dc,
                 avail_left, avail_top, avail_topright,
                 alpha_off, beta_off, chroma_qp_off, second_chroma_qp_off,
                 deblock: bool = True):
    """Tile-space device decode (drop-in for recon.decode_frame)."""
    (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs, luma_dc,
     chroma_coeffs, chroma_dc, avail_left, avail_top, avail_topright) = [
        a.astype(jnp.int32) if a.dtype != jnp.int32 else a
        for a in (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
                  luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
                  avail_topright)]
    mys, mxs, valid = _skew_geometry(mbh, mbw)
    mys_j = jnp.asarray(mys)
    mxs_j = jnp.asarray(mxs)
    valid_j = jnp.asarray(valid)
    bmax = mys.shape[1]

    resid_y, resid_u, resid_v = _residuals(
        luma_coeffs, luma_dc, chroma_coeffs, chroma_dc, qp, mb_class,
        chroma_qp_off, second_chroma_qp_off)

    # pre-skew everything (single gathers)
    resid_y_t = _skew(_to_tiles(resid_y, mbh, mbw, 4), mys_j, mxs_j)
    resid_u_t = _skew(_to_tiles(resid_u, mbh, mbw, 2), mys_j, mxs_j)
    resid_v_t = _skew(_to_tiles(resid_v, mbh, mbw, 2), mys_j, mxs_j)
    modes_mb = i4_modes.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3)
    modes_t = _skew(modes_mb, mys_j, mxs_j)          # [n, b, 4, 4]
    cls_t = _skew(mb_class, mys_j, mxs_j)
    i16_t = _skew(i16_mode, mys_j, mxs_j)
    cmode_t = _skew(chroma_mode, mys_j, mxs_j)
    qp_t = _skew(qp, mys_j, mxs_j)
    a_l_t = _skew(avail_left, mys_j, mxs_j)
    a_t_t = _skew(avail_top, mys_j, mxs_j)
    a_tr_t = _skew(avail_topright, mys_j, mxs_j)

    Yt, Ut, Vt = _intra_tile_scan(resid_y_t, resid_u_t, resid_v_t, modes_t,
                                  cls_t, i16_t, cmode_t, a_l_t, a_t_t, a_tr_t,
                                  valid_j, bmax)
    if deblock:
        Yt, Ut, Vt = _deblock_tile_scan(Yt, Ut, Vt, qp_t, mxs_j, mys_j,
                                        valid_j, bmax, alpha_off, beta_off,
                                        chroma_qp_off, second_chroma_qp_off)
    Y = _unskew_to_frame(Yt, mys_j, mxs_j, valid_j, mbh, mbw, 16)
    U = _unskew_to_frame(Ut, mys_j, mxs_j, valid_j, mbh, mbw, 8)
    V = _unskew_to_frame(Vt, mys_j, mxs_j, valid_j, mbh, mbw, 8)
    return Y.astype(jnp.uint8), U.astype(jnp.uint8), V.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "deblock"))
def decode_frames_batch(mbh, mbw, mb_class, qp, i4_modes, i16_mode,
                        chroma_mode, luma_coeffs, luma_dc, chroma_coeffs,
                        chroma_dc, avail_left, avail_top, avail_topright,
                        alpha_off, beta_off, chroma_qp_off,
                        second_chroma_qp_off, deblock: bool = True):
    fn = functools.partial(decode_frame, mbh, mbw, deblock=deblock)
    return jax.vmap(fn)(mb_class, qp, i4_modes, i16_mode, chroma_mode,
                        luma_coeffs, luma_dc, chroma_coeffs, chroma_dc,
                        avail_left, avail_top, avail_topright,
                        alpha_off, beta_off, chroma_qp_off,
                        second_chroma_qp_off)


def decode_frame_symbols(fs, deblock=None):
    """FrameSymbols -> (Y, U, V) uint8 numpy via the tile kernel."""
    if fs.has_pcm:
        raise NotImplementedError("PCM macroblocks take the host path")
    if deblock is None:
        deblock = fs.deblock_enabled
    out = decode_frame(
        fs.mb_height, fs.mb_width,
        jnp.asarray(fs.mb_class), jnp.asarray(fs.qp), jnp.asarray(fs.i4_modes),
        jnp.asarray(fs.i16_mode), jnp.asarray(fs.chroma_mode),
        jnp.asarray(fs.luma_coeffs), jnp.asarray(fs.luma_dc),
        jnp.asarray(fs.chroma_coeffs), jnp.asarray(fs.chroma_dc),
        jnp.asarray(fs.avail_left), jnp.asarray(fs.avail_top),
        jnp.asarray(fs.avail_topright),
        jnp.int32(fs.alpha_off), jnp.int32(fs.beta_off),
        jnp.int32(fs.chroma_qp_off), jnp.int32(fs.second_chroma_qp_off),
        deblock=deblock)
    return tuple(np.asarray(p) for p in out)
