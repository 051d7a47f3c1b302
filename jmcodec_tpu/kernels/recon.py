"""TPU device reconstruction pipeline (jit): symbol planes -> decoded frame.

Architecture (SURVEY §7.2/§5.7): the serial entropy front-end runs on host and
produces dense symbol planes (codec/h264/symbols.py); this module is the
device side — one compiled XLA program per frame geometry that performs

  1. batched dequant + inverse transform of every block (pure VPU element-wise)
  2. intra prediction over a macroblock WAVEFRONT: anti-diagonals d = mx + 2*my
     are mutually independent (left/top/top-right deps all have smaller d), so
     a lax.scan over d reconstructs each diagonal's MBs as one vectorized
     batch (gather neighbors -> table-driven directional prediction for all
     lanes in ONE gather-MAD -> scatter recon)
  3. the in-loop deblocking filter as a second wavefront scan (same skew: a
     MB's left edge rewrites its left neighbor's last columns, and its top-
     right neighbor's vertical edges touch pixels the MB's own top edge reads)

Everything is exact int32 arithmetic; outputs are bit-identical to the numpy
reference decoder (enforced by tests/test_device_recon.py). Multiple frames
are decoded in parallel by vmap-ing `decode_frame` — the codec-domain batch
axis that gives TPU throughput (intra frames are independent).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import deblock as DB
from ..ops import intra as IP
from ..ops import transform as T
from ..codec.h264 import macroblock as MB

PAD = 16  # frame padding on every side; junk scatters land in the pad


# ---------------------------------------------------------------------------
# Wavefront geometry (static per frame size)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def wavefront_schedule(mbh: int, mbw: int):
    """Static MB wavefront: for d = mx + 2*my, returns (mys, mxs, valid) of
    shape [n_steps, bmax] (numpy, to be closed over as constants)."""
    diags = {}
    for my in range(mbh):
        for mx in range(mbw):
            diags.setdefault(mx + 2 * my, []).append((my, mx))
    n_steps = mbw + 2 * (mbh - 1)
    bmax = max(len(v) for v in diags.values())
    mys = np.zeros((n_steps, bmax), np.int32)
    mxs = np.zeros((n_steps, bmax), np.int32)
    valid = np.zeros((n_steps, bmax), np.int32)
    for d in range(n_steps):
        for k, (my, mx) in enumerate(diags.get(d, [])):
            mys[d, k] = my
            mxs[d, k] = mx
            valid[d, k] = 1
    return mys, mxs, valid


_AR4 = np.arange(4)
_AR8 = np.arange(8)
_AR16 = np.arange(16)

# static per-blkIdx availability sources: 0=always, 1=avail_top, 2=avail_tr,
# 3=never  (for the top-right neighbor of each 4x4 block)
_TR_SRC = np.zeros(16, np.int32)
for _i in range(16):
    bx4, by4 = int(MB.BLK_X[_i]), int(MB.BLK_Y[_i])
    if _i in MB.TR_UNAVAILABLE_IN_MB:
        _TR_SRC[_i] = 3
    elif by4 > 0:
        _TR_SRC[_i] = 0
    elif bx4 == 12:
        _TR_SRC[_i] = 2
    else:
        _TR_SRC[_i] = 1


def _gather_rows(F, ys, xs0, n):
    """F[ys[b], xs0[b] + 0..n-1] -> [B, n]"""
    return F[ys[:, None], xs0[:, None] + np.arange(n)[None, :]]


def _gather_cols(F, ys0, xs, n):
    return F[ys0[:, None] + np.arange(n)[None, :], xs[:, None]]


def _scatter_block(F, ys0, xs0, vals, active, junk_y):
    """Write vals [B, h, w] at (ys0, xs0); inactive lanes write into the pad."""
    h, w = vals.shape[1], vals.shape[2]
    ys = jnp.where(active, ys0, junk_y)
    rows = ys[:, None] + np.arange(h)[None, :]
    cols = xs0[:, None] + np.arange(w)[None, :]
    return F.at[rows[:, :, None], cols[:, None, :]].set(vals)


# ---------------------------------------------------------------------------
# Residual decode (stage 1): fully batched
# ---------------------------------------------------------------------------

def _residuals(luma_coeffs, luma_dc, chroma_coeffs, chroma_dc, qp, mb_class,
               chroma_qp_off, second_chroma_qp_off):
    dq = jnp.asarray(T.DEQUANT4x4)
    mbh, mbw = qp.shape
    qp_blk = jnp.repeat(jnp.repeat(qp, 4, axis=0), 4, axis=1)  # [mbh*4, mbw*4]
    d = T.dequant_4x4(luma_coeffs, qp_blk, jnp, dq)
    # I16 luma DC: inverse Hadamard + exact scaling, spliced into d[...,0,0]
    f = T.hadamard_4x4(luma_dc, jnp)
    ls = dq[qp % 6][..., 0, 0] * 16          # [mbh, mbw]
    q6 = qp // 6
    hi = (f * ls[..., None, None]) << jnp.maximum(q6 - 6, 0)[..., None, None]
    lo = (f * ls[..., None, None] + (1 << jnp.maximum(5 - q6, 0))[..., None, None]) \
        >> jnp.maximum(6 - q6, 0)[..., None, None]
    dc_vals = jnp.where((qp >= 36)[..., None, None], hi, lo)  # [mbh,mbw,4,4]
    is16_blk = jnp.repeat(jnp.repeat(mb_class == 1, 4, 0), 4, 1)
    dc_for_blk = dc_vals.transpose(0, 2, 1, 3).reshape(mbh * 4, mbw * 4)
    d = d.at[..., 0, 0].set(jnp.where(is16_blk, dc_for_blk, d[..., 0, 0]))
    resid_y = T.inverse_transform_4x4(d, jnp)  # [mbh*4, mbw*4, 4, 4]

    cqt = jnp.asarray(T.CHROMA_QP)
    resid_c = []
    for comp, off in ((0, chroma_qp_off), (1, second_chroma_qp_off)):
        qpc = cqt[jnp.clip(qp + off, 0, 51)]  # [mbh, mbw]
        qpc_blk = jnp.repeat(jnp.repeat(qpc, 2, 0), 2, 1)
        dcq = T.dequant_4x4(chroma_coeffs[comp], qpc_blk, jnp, dq)
        fc = T.hadamard_2x2(chroma_dc[comp], jnp)
        lsc = dq[qpc % 6][..., 0, 0] * 16
        dcv = ((fc * lsc[..., None, None]) << (qpc // 6)[..., None, None]) >> 5
        dc_for_blk = dcv.transpose(0, 2, 1, 3).reshape(mbh * 2, mbw * 2)
        dcq = dcq.at[..., 0, 0].set(dc_for_blk)
        resid_c.append(T.inverse_transform_4x4(dcq, jnp))
    return resid_y, resid_c[0], resid_c[1]


# ---------------------------------------------------------------------------
# Intra prediction wavefront (stage 2)
# ---------------------------------------------------------------------------

# Static weight tensor for the directional modes: W9[m, p, c] = weight of
# neighbor c in pixel p of mode m, derived from the gather index tables.
# Prediction becomes two small matmuls (one-hot mode select + weighted sum),
# which the TPU runs on the MXU instead of many tiny gathers. All values are
# small integers, exact in float32.
def _build_i4_weights():
    W = np.zeros((9, 16, 13), np.float32)
    for m in range(9):
        for p in range(16):
            y, x = divmod(p, 4)
            W[m, p, IP.I4_TAB_A[m, y, x]] += 1
            W[m, p, IP.I4_TAB_B[m, y, x]] += 2
            W[m, p, IP.I4_TAB_C[m, y, x]] += 1
    return W


_I4_W9 = _build_i4_weights()  # [9, 16, 13]


def _pred_i4_batch(n, modes, avail_t, avail_l):
    """n: [B,13] neighbor vectors; modes: [B] -> [B,4,4] predictions."""
    W9 = jnp.asarray(_I4_W9.reshape(9, 16 * 13))
    onehot = jax.nn.one_hot(modes, 9, dtype=jnp.float32)          # [B,9]
    Wsel = (onehot @ W9).reshape(-1, 16, 13)                      # [B,16,13]
    acc = jnp.einsum("bpc,bc->bp", Wsel, n.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    pred_dir = ((acc.astype(jnp.int32) + 2) >> 2).reshape(-1, 4, 4)
    # DC
    sum_t = n[:, 5:9].sum(axis=1)
    sum_l = n[:, 0:4].sum(axis=1)
    dc = jnp.where(avail_t & avail_l, (sum_t + sum_l + 4) >> 3,
                   jnp.where(avail_l, (sum_l + 2) >> 2,
                             jnp.where(avail_t, (sum_t + 2) >> 2, 128)))
    return jnp.where((modes == IP.I4_DC)[:, None, None], dc[:, None, None],
                     pred_dir)


def _pred_16_batch(t16, l16, tl, mode, avail_t, avail_l):
    """16x16 luma prediction for a batch of MBs. t16,l16: [B,16]; -> [B,16,16]."""
    B = t16.shape[0]
    v = jnp.broadcast_to(t16[:, None, :], (B, 16, 16))
    h = jnp.broadcast_to(l16[:, :, None], (B, 16, 16))
    sum_t = t16.sum(1)
    sum_l = l16.sum(1)
    dc = jnp.where(avail_t & avail_l, (sum_t + sum_l + 16) >> 5,
                   jnp.where(avail_l, (sum_l + 8) >> 4,
                             jnp.where(avail_t, (sum_t + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dc[:, None, None], (B, 16, 16))
    xs = np.arange(8)
    top_ext = jnp.concatenate([tl[:, None], t16], axis=1)   # [B,17]
    left_ext = jnp.concatenate([tl[:, None], l16], axis=1)
    Hs = ((xs + 1)[None, :] * (top_ext[:, 1 + 8 + xs] - top_ext[:, 1 + 6 - xs])).sum(1)
    Vs = ((xs + 1)[None, :] * (left_ext[:, 1 + 8 + xs] - left_ext[:, 1 + 6 - xs])).sum(1)
    a = 16 * (l16[:, 15] + t16[:, 15])
    b = (5 * Hs + 32) >> 6
    c = (5 * Vs + 32) >> 6
    yy, xx = np.mgrid[0:16, 0:16]
    plane = jnp.clip((a[:, None, None] + b[:, None, None] * (xx - 7)[None]
                      + c[:, None, None] * (yy - 7)[None] + 16) >> 5, 0, 255)
    return jnp.where((mode == IP.I16_V)[:, None, None], v,
           jnp.where((mode == IP.I16_H)[:, None, None], h,
           jnp.where((mode == IP.I16_DC)[:, None, None], dc, plane)))


def _pred_chroma_batch(t8, l8, tl, mode, avail_t, avail_l):
    """Chroma 8x8 prediction batch. t8,l8: [B,8] -> [B,8,8]."""
    B = t8.shape[0]
    v = jnp.broadcast_to(t8[:, None, :], (B, 8, 8))
    h = jnp.broadcast_to(l8[:, :, None], (B, 8, 8))
    # DC per 2x2 sub-block arrangement
    out_dc = jnp.zeros((B, 8, 8), jnp.int32)
    for by in (0, 1):
        for bx in (0, 1):
            ts = t8[:, 4 * bx:4 * bx + 4].sum(1)
            ls = l8[:, 4 * by:4 * by + 4].sum(1)
            if bx == by:
                val = jnp.where(avail_t & avail_l, (ts + ls + 4) >> 3,
                      jnp.where(avail_l, (ls + 2) >> 2,
                      jnp.where(avail_t, (ts + 2) >> 2, 128)))
            elif bx == 1:
                val = jnp.where(avail_t, (ts + 2) >> 2,
                      jnp.where(avail_l, (ls + 2) >> 2, 128))
            else:
                val = jnp.where(avail_l, (ls + 2) >> 2,
                      jnp.where(avail_t, (ts + 2) >> 2, 128))
            out_dc = out_dc.at[:, 4 * by:4 * by + 4, 4 * bx:4 * bx + 4].set(
                jnp.broadcast_to(val[:, None, None], (B, 4, 4)))
    xs = np.arange(4)
    top_ext = jnp.concatenate([tl[:, None], t8], axis=1)
    left_ext = jnp.concatenate([tl[:, None], l8], axis=1)
    Hs = ((xs + 1)[None, :] * (top_ext[:, 1 + 4 + xs] - top_ext[:, 1 + 2 - xs])).sum(1)
    Vs = ((xs + 1)[None, :] * (left_ext[:, 1 + 4 + xs] - left_ext[:, 1 + 2 - xs])).sum(1)
    a = 16 * (l8[:, 7] + t8[:, 7])
    b = (17 * Hs + 16) >> 5
    c = (17 * Vs + 16) >> 5
    yy, xx = np.mgrid[0:8, 0:8]
    plane = jnp.clip((a[:, None, None] + b[:, None, None] * (xx - 3)[None]
                      + c[:, None, None] * (yy - 3)[None] + 16) >> 5, 0, 255)
    return jnp.where((mode == IP.IC_DC)[:, None, None], out_dc,
           jnp.where((mode == IP.IC_H)[:, None, None], h,
           jnp.where((mode == IP.IC_V)[:, None, None], v, plane)))


def _intra_scan(Yp, Up, Vp, resid_y, resid_u, resid_v, sym, sched):
    mys_all, mxs_all, valid_all = sched
    mbh, mbw = sym["qp"].shape
    # Junk rows must sit >=4 rows inside the bottom pad: edge scatters use
    # offsets down to -4 from the junk base.
    junk_y = Yp.shape[0] - PAD + 8
    junk_c = Up.shape[0] - PAD // 2 + 4

    i4m = sym["i4_modes"]

    def body(carry, xs):
        Yp, Up, Vp = carry
        mys, mxs, valid = xs
        act = valid == 1
        flat = mys * mbw + mxs
        cls = sym["mb_class"].reshape(-1)[flat]
        a_l = sym["avail_left"].reshape(-1)[flat] == 1
        a_t = sym["avail_top"].reshape(-1)[flat] == 1
        a_tr = sym["avail_topright"].reshape(-1)[flat] == 1
        a_tl = a_t & a_l
        y0 = PAD + mys * 16
        x0 = PAD + mxs * 16

        # ---------- I4x4: 16 sequential sub-blocks ----------
        for i in range(16):
            bx4, by4 = int(MB.BLK_X[i]), int(MB.BLK_Y[i])
            y = y0 + by4
            x = x0 + bx4
            bl = a_l if bx4 == 0 else jnp.full_like(a_l, True)
            bt = a_t if by4 == 0 else jnp.full_like(a_t, True)
            src = _TR_SRC[i]
            if src == 0:
                btr = jnp.full_like(a_t, True)
            elif src == 1:
                btr = a_t
            elif src == 2:
                btr = a_tr
            else:
                btr = jnp.full_like(a_t, False)
            t8 = _gather_rows(Yp, y - 1, x, 8)
            t8 = jnp.where(bt[:, None], t8, 0)
            t8 = t8.at[:, 4:].set(jnp.where((bt & btr)[:, None], t8[:, 4:],
                                            t8[:, 3:4]))
            l4 = _gather_cols(Yp, y, x - 1, 4)
            l4 = jnp.where(bl[:, None], l4, 0)
            tl = jnp.where(bt & bl, Yp[y - 1, x - 1], 0)
            n = jnp.concatenate([l4[:, ::-1], tl[:, None], t8], axis=1)
            modes = i4m[mys * 4 + by4 // 4, mxs * 4 + bx4 // 4]
            pred = _pred_i4_batch(n, modes, bt, bl)
            res = resid_y[mys * 4 + by4 // 4, mxs * 4 + bx4 // 4]
            rec = jnp.clip(pred + res, 0, 255)
            Yp = _scatter_block(Yp, y, x, rec, act & (cls == 0), junk_y)

        # ---------- I16x16 ----------
        t16 = jnp.where(a_t[:, None], _gather_rows(Yp, y0 - 1, x0, 16), 0)
        l16 = jnp.where(a_l[:, None], _gather_cols(Yp, y0, x0 - 1, 16), 0)
        tl16 = jnp.where(a_tl, Yp[y0 - 1, x0 - 1], 0)
        pred16 = _pred_16_batch(t16, l16, tl16, sym["i16_mode"].reshape(-1)[flat],
                                a_t, a_l)
        # residual 16x16 for the MB: [B,4(by),4(bx),4,4] -> [B,16,16]
        rblk = resid_y[(mys * 4)[:, None, None] + _AR4[None, :, None],
                       (mxs * 4)[:, None, None] + _AR4[None, None, :]]
        rmb = rblk.transpose(0, 1, 3, 2, 4).reshape(-1, 16, 16)
        rec16 = jnp.clip(pred16 + rmb, 0, 255)
        Yp = _scatter_block(Yp, y0, x0, rec16, act & (cls == 1), junk_y)

        # ---------- chroma (both classes) ----------
        cy0 = PAD // 2 + mys * 8
        cx0 = PAD // 2 + mxs * 8
        cmode = sym["chroma_mode"].reshape(-1)[flat]
        for plane_idx, (P, residc) in enumerate(((Up, resid_u), (Vp, resid_v))):
            t8c = jnp.where(a_t[:, None], _gather_rows(P, cy0 - 1, cx0, 8), 0)
            l8c = jnp.where(a_l[:, None], _gather_cols(P, cy0, cx0 - 1, 8), 0)
            tlc = jnp.where(a_tl, P[cy0 - 1, cx0 - 1], 0)
            predc = _pred_chroma_batch(t8c, l8c, tlc, cmode, a_t, a_l)
            rc = residc[(mys * 2)[:, None, None] + np.arange(2)[None, :, None],
                        (mxs * 2)[:, None, None] + np.arange(2)[None, None, :]]
            rcmb = rc.transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8)
            recc = jnp.clip(predc + rcmb, 0, 255)
            P = _scatter_block(P, cy0, cx0, recc, act & (cls != 2), junk_c)
            if plane_idx == 0:
                Up = P
            else:
                Vp = P
        return (Yp, Up, Vp), None

    (Yp, Up, Vp), _ = jax.lax.scan(
        body, (Yp, Up, Vp),
        (jnp.asarray(mys_all), jnp.asarray(mxs_all), jnp.asarray(valid_all)))
    return Yp, Up, Vp


# ---------------------------------------------------------------------------
# Deblocking wavefront (stage 3)
# ---------------------------------------------------------------------------

def _deblock_scan(Yp, Up, Vp, sym, sched, alpha_off, beta_off,
                  chroma_qp_off, second_chroma_qp_off):
    mys_all, mxs_all, valid_all = sched
    mbh, mbw = sym["qp"].shape
    qp = sym["qp"]
    alpha_t = jnp.asarray(DB.ALPHA_TABLE)
    beta_t = jnp.asarray(DB.BETA_TABLE)
    tc0_t = jnp.asarray(DB.TC0_TABLE).reshape(-1)
    cqt = jnp.asarray(T.CHROMA_QP)
    junk_y = Yp.shape[0] - PAD + 8
    junk_c = Up.shape[0] - PAD // 2 + 4

    def qav(qa, qb):
        return (qa + qb + 1) >> 1

    def body(carry, xs):
        Yp, Up, Vp = carry
        mys, mxs, valid = xs
        act = valid == 1
        flat = mys * mbw + mxs
        qcur = qp.reshape(-1)[flat]
        qleft = qp.reshape(-1)[jnp.maximum(flat - 1, 0)]
        qtop = qp.reshape(-1)[jnp.maximum(flat - mbw, 0)]
        y0 = PAD + mys * 16
        x0 = PAD + mxs * 16

        # ---- luma vertical edges (e = 0..3) ----
        for e in range(4):
            x = x0 + 4 * e
            if e == 0:
                bs = 4
                q_nb = qleft
                edge_act = act & (mxs > 0)
            else:
                bs = 3
                q_nb = qcur
                edge_act = act
            qa = qav(qcur, q_nb)
            ia = jnp.clip(qa + alpha_off, 0, 51)
            ib = jnp.clip(qa + beta_off, 0, 51)
            cols = Yp[(y0[:, None] + _AR16[None, :])[:, :, None],
                      (x[:, None] + np.arange(-4, 4)[None, :])[:, None, :]]
            res = DB._filter_edge_luma(
                *[cols[:, :, k] for k in range(8)],
                jnp.where(edge_act, bs, 0)[:, None], ia[:, None], ib[:, None],
                xp=jnp, alpha_t=alpha_t, beta_t=beta_t, tc0_t=tc0_t)
            newcols = jnp.stack(res, axis=2)
            ysafe = jnp.where(act, y0, junk_y)
            Yp = Yp.at[(ysafe[:, None] + _AR16[None, :])[:, :, None],
                       (x[:, None] + np.arange(-4, 4)[None, :])[:, None, :]].set(newcols)

        # ---- luma horizontal edges ----
        for e in range(4):
            y = y0 + 4 * e
            if e == 0:
                bs = 4
                q_nb = qtop
                edge_act = act & (mys > 0)
            else:
                bs = 3
                q_nb = qcur
                edge_act = act
            qa = qav(qcur, q_nb)
            ia = jnp.clip(qa + alpha_off, 0, 51)
            ib = jnp.clip(qa + beta_off, 0, 51)
            rows = Yp[(y[:, None] + np.arange(-4, 4)[None, :])[:, :, None],
                      (x0[:, None] + _AR16[None, :])[:, None, :]]
            res = DB._filter_edge_luma(
                *[rows[:, k, :] for k in range(8)],
                jnp.where(edge_act, bs, 0)[:, None], ia[:, None], ib[:, None],
                xp=jnp, alpha_t=alpha_t, beta_t=beta_t, tc0_t=tc0_t)
            newrows = jnp.stack(res, axis=1)
            ysafe = jnp.where(act, y, junk_y)
            Yp = Yp.at[(ysafe[:, None] + np.arange(-4, 4)[None, :])[:, :, None],
                       (x0[:, None] + _AR16[None, :])[:, None, :]].set(newrows)

        # ---- chroma edges ----
        cy0 = PAD // 2 + mys * 8
        cx0 = PAD // 2 + mxs * 8
        for plane_idx in range(2):
            P = Up if plane_idx == 0 else Vp
            off = chroma_qp_off if plane_idx == 0 else second_chroma_qp_off
            qc_cur = cqt[jnp.clip(qcur + off, 0, 51)]
            qc_left = cqt[jnp.clip(qleft + off, 0, 51)]
            qc_top = cqt[jnp.clip(qtop + off, 0, 51)]
            for e in (0, 2):  # chroma x = 0, 4
                cx = cx0 + 2 * e
                if e == 0:
                    bs = 4
                    qa = qav(qc_cur, qc_left)
                    edge_act = act & (mxs > 0)
                else:
                    bs = 3
                    qa = qav(qc_cur, qc_cur)
                    edge_act = act
                ia = jnp.clip(qa + alpha_off, 0, 51)
                ib = jnp.clip(qa + beta_off, 0, 51)
                cols = P[(cy0[:, None] + _AR8[None, :])[:, :, None],
                         (cx[:, None] + np.arange(-2, 2)[None, :])[:, None, :]]
                p0n, q0n = DB._filter_edge_chroma(
                    cols[:, :, 0], cols[:, :, 1], cols[:, :, 2], cols[:, :, 3],
                    jnp.where(edge_act, bs, 0)[:, None], ia[:, None], ib[:, None],
                    xp=jnp, alpha_t=alpha_t, beta_t=beta_t, tc0_t=tc0_t)
                newc = jnp.stack([cols[:, :, 0], p0n, q0n, cols[:, :, 3]], axis=2)
                ysafe = jnp.where(act, cy0, junk_c)
                P = P.at[(ysafe[:, None] + _AR8[None, :])[:, :, None],
                         (cx[:, None] + np.arange(-2, 2)[None, :])[:, None, :]].set(newc)
            for e in (0, 2):
                cy = cy0 + 2 * e
                if e == 0:
                    bs = 4
                    qa = qav(qc_cur, qc_top)
                    edge_act = act & (mys > 0)
                else:
                    bs = 3
                    qa = qav(qc_cur, qc_cur)
                    edge_act = act
                ia = jnp.clip(qa + alpha_off, 0, 51)
                ib = jnp.clip(qa + beta_off, 0, 51)
                rows = P[(cy[:, None] + np.arange(-2, 2)[None, :])[:, :, None],
                         (cx0[:, None] + _AR8[None, :])[:, None, :]]
                p0n, q0n = DB._filter_edge_chroma(
                    rows[:, 0, :], rows[:, 1, :], rows[:, 2, :], rows[:, 3, :],
                    jnp.where(edge_act, bs, 0)[:, None], ia[:, None], ib[:, None],
                    xp=jnp, alpha_t=alpha_t, beta_t=beta_t, tc0_t=tc0_t)
                newr = jnp.stack([rows[:, 0, :], p0n, q0n, rows[:, 3, :]], axis=1)
                ysafe = jnp.where(act, cy, junk_c)
                P = P.at[(ysafe[:, None] + np.arange(-2, 2)[None, :])[:, :, None],
                         (cx0[:, None] + _AR8[None, :])[:, None, :]].set(newr)
            if plane_idx == 0:
                Up = P
            else:
                Vp = P
        return (Yp, Up, Vp), None

    (Yp, Up, Vp), _ = jax.lax.scan(
        body, (Yp, Up, Vp),
        (jnp.asarray(mys_all), jnp.asarray(mxs_all), jnp.asarray(valid_all)))
    return Yp, Up, Vp


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "deblock"))
def decode_frame(mbh: int, mbw: int, mb_class, qp, i4_modes, i16_mode,
                 chroma_mode, luma_coeffs, luma_dc, chroma_coeffs, chroma_dc,
                 avail_left, avail_top, avail_topright,
                 alpha_off, beta_off, chroma_qp_off, second_chroma_qp_off,
                 deblock: bool = True):
    """Device decode of one frame from symbol planes -> (Y, U, V) uint8
    (padded to MB multiples; caller crops)."""
    (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs, luma_dc,
     chroma_coeffs, chroma_dc, avail_left, avail_top, avail_topright) = [
        a.astype(jnp.int32) if a.dtype != jnp.int32 else a
        for a in (mb_class, qp, i4_modes, i16_mode, chroma_mode, luma_coeffs,
                  luma_dc, chroma_coeffs, chroma_dc, avail_left, avail_top,
                  avail_topright)]
    sym = dict(mb_class=mb_class, qp=qp, i4_modes=i4_modes, i16_mode=i16_mode,
               chroma_mode=chroma_mode, avail_left=avail_left,
               avail_top=avail_top, avail_topright=avail_topright)
    H, W = mbh * 16, mbw * 16
    Yp = jnp.zeros((H + 2 * PAD, W + 2 * PAD), jnp.int32)
    Up = jnp.zeros((H // 2 + PAD, W // 2 + PAD), jnp.int32)
    Vp = jnp.zeros_like(Up)

    resid_y, resid_u, resid_v = _residuals(
        luma_coeffs, luma_dc, chroma_coeffs, chroma_dc, qp, mb_class,
        chroma_qp_off, second_chroma_qp_off)

    sched = wavefront_schedule(mbh, mbw)
    Yp, Up, Vp = _intra_scan(Yp, Up, Vp, resid_y, resid_u, resid_v, sym, sched)
    if deblock:
        Yp, Up, Vp = _deblock_scan(Yp, Up, Vp, sym, sched, alpha_off, beta_off,
                                   chroma_qp_off, second_chroma_qp_off)
    Y = Yp[PAD:PAD + H, PAD:PAD + W].astype(jnp.uint8)
    U = Up[PAD // 2:PAD // 2 + H // 2, PAD // 2:PAD // 2 + W // 2].astype(jnp.uint8)
    V = Vp[PAD // 2:PAD // 2 + H // 2, PAD // 2:PAD // 2 + W // 2].astype(jnp.uint8)
    return Y, U, V


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "deblock"))
def decode_frames_batch(mbh, mbw, mb_class, qp, i4_modes, i16_mode,
                        chroma_mode, luma_coeffs, luma_dc, chroma_coeffs,
                        chroma_dc, avail_left, avail_top, avail_topright,
                        alpha_off, beta_off, chroma_qp_off,
                        second_chroma_qp_off, deblock: bool = True):
    """vmap of decode_frame over a leading frame axis — the codec-domain batch
    that amortizes the wavefront scan's per-step overhead (intra frames are
    mutually independent; GOP-batching in the session feeds this)."""
    fn = functools.partial(decode_frame, mbh, mbw, deblock=deblock)
    return jax.vmap(fn)(mb_class, qp, i4_modes, i16_mode, chroma_mode,
                        luma_coeffs, luma_dc, chroma_coeffs, chroma_dc,
                        avail_left, avail_top, avail_topright,
                        alpha_off, beta_off, chroma_qp_off,
                        second_chroma_qp_off)


def stack_symbols(fss):
    """Stack a list of same-geometry FrameSymbols into batched device args.

    Transfers are the bottleneck on tunneled TPUs, so planes ship in the
    narrowest exact dtype (coefficients fit int16 at all legal QPs; metadata
    fits int8) and are widened back to int32 on device."""
    import numpy as _np
    narrow = {"mb_class": _np.int8, "qp": _np.int8, "i4_modes": _np.int8,
              "i16_mode": _np.int8, "chroma_mode": _np.int8,
              "luma_coeffs": _np.int16, "luma_dc": _np.int16,
              "chroma_coeffs": _np.int16, "chroma_dc": _np.int16,
              "avail_left": _np.int8, "avail_top": _np.int8,
              "avail_topright": _np.int8}
    arrs = [jnp.asarray(_np.stack([getattr(f, n) for f in fss])
                        .astype(dt, copy=False))
            for n, dt in narrow.items()]
    scal = [jnp.asarray(_np.array([getattr(f, n) for f in fss], _np.int32))
            for n in ["alpha_off", "beta_off", "chroma_qp_off",
                      "second_chroma_qp_off"]]
    return arrs + scal


def widen_symbol_args(args):
    """Cast narrow transfer dtypes back to int32 (first op on device)."""
    return [a.astype(jnp.int32) if a.dtype != jnp.int32 else a for a in args]


def decode_frame_symbols(fs, deblock=None):
    """Convenience wrapper: FrameSymbols -> (Y, U, V) uint8 numpy (uncropped)."""
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
