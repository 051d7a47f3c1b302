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

import os

# split intra/deblock scans pipeline better than one fused scan on v5e
FUSED_SCAN = os.environ.get("JMX_FUSED_SCAN") == "1"


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



# ---------------------------------------------------------------------------
# lane-axis roll hook: the wavefront's only cross-lane op. Single device:
# jnp.roll. Under a row-sharded shard_map (parallel/spatial.py), rolls cross
# shard boundaries via a ppermute ring of the boundary lane (SURVEY §2.3 ③:
# CTU-row bands per chip with halo exchange on ICI).
# ---------------------------------------------------------------------------

_LANE_AXIS = None


class lane_axis:
    """Trace-time context: route lane rolls through ppermute over `name`."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        global _LANE_AXIS
        self._prev = _LANE_AXIS
        _LANE_AXIS = self.name

    def __exit__(self, *a):
        global _LANE_AXIS
        _LANE_AXIS = self._prev


def _roll_lanes(x, k):
    """Global roll by k (+1/-1) along the (possibly sharded) lane axis 0."""
    ax = _LANE_AXIS
    if ax is None:
        return jnp.roll(x, k, axis=0)
    n = jax.lax.axis_size(ax)
    if k == 1:
        prev = jax.lax.ppermute(x[-1:], ax,
                                [(i, (i + 1) % n) for i in range(n)])
        return jnp.concatenate([prev, x[:-1]], axis=0)
    assert k == -1
    nxt = jax.lax.ppermute(x[:1], ax,
                           [(i, (i - 1) % n) for i in range(n)])
    return jnp.concatenate([x[1:], nxt], axis=0)


def _intra_step(carry, xs, has_inter):
    """One wavefront step of intra reconstruction (module-level so the fused
    intra+deblock scan can reuse it). Returns (carry, (Y, U, V) tiles)."""
    def roll1(x):
        return _roll_lanes(x, 1)

    if True:
        (P1y, P2y, P3y, P1u, P2u, P3u, P1v, P2v, P3v) = carry
        if has_inter:
            (resid, resid_u, resid_v, modes, cls, i16m, cmode,
             a_l, a_t, a_tr, valid, int_y, int_u, int_v) = xs
        else:
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
        if has_inter:
            Rfin = jnp.where((cls == 3)[:, None, None], int_y, Rfin)
        Rfin = jnp.where(act[:, None, None], Rfin, 0)

        # ---- chroma ----
        outs_c = []
        for ci, (P1c, P2c, P3c, residc) in enumerate(
                ((P1u, P2u, P3u, resid_u), (P1v, P2v, P3v, resid_v))):
            top_c = roll1(P2c)[:, 7, :]
            left_c = P1c[:, :, 7]
            tl_c = roll1(P3c)[:, 7, 7]
            t8c = jnp.where(a_t[:, None], top_c, 0)
            l8c = jnp.where(a_l[:, None], left_c, 0)
            tlc = jnp.where(a_t & a_l, tl_c, 0)
            predc = _pred_chroma_batch(t8c, l8c, tlc, cmode, a_t, a_l)
            recc = jnp.clip(predc + residc, 0, 255)
            if has_inter:
                recc = jnp.where((cls == 3)[:, None, None],
                                 int_u if ci == 0 else int_v, recc)
            outs_c.append(jnp.where(act[:, None, None], recc, 0))

        new_carry = (Rfin, P1y, P2y, outs_c[0], P1u, P2u,
                     outs_c[1], P1v, P2v)
        return new_carry, (Rfin, outs_c[0], outs_c[1])


def _intra_carry0(bmax):
    z16 = jnp.zeros((bmax, 16, 16), jnp.int32)
    z8 = jnp.zeros((bmax, 8, 8), jnp.int32)
    return (z16, z16, z16, z8, z8, z8, z8, z8, z8)


def _intra_tile_scan(resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t,
                     i16_t, cmode_t, a_l_t, a_t_t, a_tr_t, valid_t, bmax,
                     inter_y_t=None, inter_u_t=None, inter_v_t=None):
    """Scan over diagonals; returns (Y_tiles, U_tiles, V_tiles) skewed."""
    has_inter = inter_y_t is not None
    xs = (resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t,
          i16_t, cmode_t, a_l_t, a_t_t, a_tr_t, valid_t)
    if has_inter:
        xs = xs + (inter_y_t, inter_u_t, inter_v_t)
    _, ys = jax.lax.scan(functools.partial(_intra_step, has_inter=has_inter),
                         _intra_carry0(bmax), xs)
    return ys


# ---------------------------------------------------------------------------
# inter prediction (batched, wavefront-free: reads only reference frames)
# ---------------------------------------------------------------------------

MC_PAD = 32  # reference-plane padding (covers legal MVs after clipping)


def prep_ref_planes(Y, U, V):
    """Host-side helper: pad one reference picture for device MC.
    Returns dict of numpy planes (int32)."""
    py = np.pad(np.asarray(Y, np.int32), MC_PAD, mode="edge")
    pu = np.pad(np.asarray(U, np.int32), MC_PAD // 2, mode="edge")
    pv = np.pad(np.asarray(V, np.int32), MC_PAD // 2, mode="edge")
    return py, pu, pv


def _halfpel_planes(refp):
    """refp: [n_refs, Hp, Wp] int32. Returns (G, b, h, j, b1) planes; b/h/j
    per spec 8.4.2.2.1 (b1 is the unrounded horizontal intermediate)."""
    x = refp
    xpad = jnp.pad(x, ((0, 0), (2, 3), (2, 3)), mode="edge")

    def six_h(a):
        return (a[:, :, 0:-5] - 5 * a[:, :, 1:-4] + 20 * a[:, :, 2:-3]
                + 20 * a[:, :, 3:-2] - 5 * a[:, :, 4:-1] + a[:, :, 5:])

    def six_v(a):
        return (a[:, 0:-5, :] - 5 * a[:, 1:-4, :] + 20 * a[:, 2:-3, :]
                + 20 * a[:, 3:-2, :] - 5 * a[:, 4:-1, :] + a[:, 5:, :])

    b1 = six_h(xpad)[:, 2:-3, :]                 # [n, Hp, Wp]
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    h1 = six_v(xpad)[:, :, 2:-3]
    hh = jnp.clip((h1 + 16) >> 5, 0, 255)
    b1pad = jnp.pad(b1, ((0, 0), (2, 3), (0, 0)), mode="edge")
    j1 = six_v(b1pad)
    jj = jnp.clip((j1 + 512) >> 10, 0, 255)
    return x, b, hh, jj


# For each (fx, fy): (plane1, dx1, dy1, plane2, dx2, dy2, is_avg)
# planes: 0=G 1=b 2=h 3=j ; quarter positions average two planes.
_MC_SEL = np.zeros((4, 4, 7), np.int32)
for _fy in range(4):
    for _fx in range(4):
        G, B_, H_, J_ = 0, 1, 2, 3
        if (_fx, _fy) == (0, 0):
            sel = (G, 0, 0, G, 0, 0, 0)
        elif _fy == 0:
            sel = {1: (G, 0, 0, B_, 0, 0, 1), 2: (B_, 0, 0, B_, 0, 0, 0),
                   3: (G, 1, 0, B_, 0, 0, 1)}[_fx]
        elif _fx == 0:
            sel = {1: (G, 0, 0, H_, 0, 0, 1), 2: (H_, 0, 0, H_, 0, 0, 0),
                   3: (G, 0, 1, H_, 0, 0, 1)}[_fy]
        elif (_fx, _fy) == (2, 2):
            sel = (J_, 0, 0, J_, 0, 0, 0)
        elif _fy == 2:
            sel = (H_, 0, 0, J_, 0, 0, 1) if _fx == 1 else (H_, 1, 0, J_, 0, 0, 1)
        elif _fx == 2:
            sel = (B_, 0, 0, J_, 0, 0, 1) if _fy == 1 else (B_, 0, 1, J_, 0, 0, 1)
        else:
            bdy = 0 if _fy == 1 else 1
            hdx = 0 if _fx == 1 else 1
            sel = (B_, 0, bdy, H_, hdx, 0, 1)
        _MC_SEL[_fy, _fx] = sel


def _mc_luma_batched(refp, mv, ref_idx, mbh, mbw, clip_y=None):
    """refp: [n_refs, Hp, Wp]; mv: [mbh*4, mbw*4, 2]; ref_idx same grid.
    Returns predicted luma [mbh*4, mbw*4, 4, 4] int32. clip_y overrides
    the vertical clamp bounds (row-sharded MC: a band's local coordinates
    shift the global [3, Hp-8] clamp by its row offset)."""
    n_refs, Hp, Wp = refp.shape
    G, b, hh, jj = _halfpel_planes(refp)
    planes = jnp.stack([G, b, hh, jj], axis=1)      # [n_refs, 4, Hp, Wp]
    gh, gw = mv.shape[0], mv.shape[1]
    bys, bxs = np.mgrid[0:gh, 0:gw]
    x0 = bxs * 4 + MC_PAD
    y0 = bys * 4 + MC_PAD
    mvx, mvy = mv[..., 0], mv[..., 1]
    y_lo, y_hi = (3, Hp - 8) if clip_y is None else clip_y
    xi = jnp.clip(x0 + (mvx >> 2), 3, Wp - 8)
    yi = jnp.clip(y0 + (mvy >> 2), y_lo, y_hi)
    sel = jnp.asarray(_MC_SEL)[mvy & 3, mvx & 3]    # [gh, gw, 7]
    r = jnp.clip(ref_idx, 0, n_refs - 1)

    def gather_plane(pids, dxs, dys):
        rows = (yi + dys)[..., None, None] + np.arange(4)[None, None, :, None]
        cols = (xi + dxs)[..., None, None] + np.arange(4)[None, None, None, :]
        return planes[r[..., None, None], pids[..., None, None], rows, cols]

    p1 = gather_plane(sel[..., 0], sel[..., 1], sel[..., 2])
    p2 = gather_plane(sel[..., 3], sel[..., 4], sel[..., 5])
    avg = (p1 + p2 + 1) >> 1
    return jnp.where((sel[..., 6] == 1)[..., None, None], avg, p1)


def _mc_chroma_batched(refc, mv, ref_idx, mbh, mbw, clip_y=None):
    """refc: [n_refs, Hc, Wc] padded chroma. Chroma moves with the luma
    partitioning, so prediction is evaluated per 2x2 chroma block co-located
    with each luma 4x4 block: returns [gh, gw, 2, 2] int32 (gh=mbh*4).
    clip_y: vertical clamp override for row-sharded bands."""
    n_refs, Hc, Wc = refc.shape
    gh, gw = mv.shape[0], mv.shape[1]
    bys, bxs = np.mgrid[0:gh, 0:gw]
    x0 = bxs * 2 + MC_PAD // 2
    y0 = bys * 2 + MC_PAD // 2
    mvx, mvy = mv[..., 0], mv[..., 1]
    y_lo, y_hi = (0, Hc - 4) if clip_y is None else clip_y
    xi = jnp.clip(x0 + (mvx >> 3), 0, Wc - 4)
    yi = jnp.clip(y0 + (mvy >> 3), y_lo, y_hi)
    dx = (mvx & 7)[..., None, None]
    dy = (mvy & 7)[..., None, None]
    r = jnp.clip(ref_idx, 0, n_refs - 1)

    def gat(oy, ox):
        rows = (yi + oy)[..., None, None] + np.arange(2)[None, None, :, None]
        cols = (xi + ox)[..., None, None] + np.arange(2)[None, None, None, :]
        return refc[r[..., None, None], rows, cols]

    A = gat(0, 0)
    Bq = gat(0, 1)
    C = gat(1, 0)
    D = gat(1, 1)
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * Bq
            + (8 - dx) * dy * C + dx * dy * D + 32) >> 6


def _bs_planes(mb_class, nz_luma, mv, ref_idx, ref_ids=None):
    """Device twin of refdec.compute_bs: per-4x4-edge boundary strengths.
    Returns (bs_v, bs_h) [gh, gw] (edge left/top of each block). ref_ids
    [R] maps list indices to picture identities (8.7.2.1 compares
    PICTURES — x264 weightp=2 duplicates one picture at two indices)."""
    gh, gw = nz_luma.shape
    mbcls_blk = jnp.repeat(jnp.repeat(mb_class, 4, 0), 4, 1)
    blk_intra = mbcls_blk != 3
    nz = nz_luma > 0
    if ref_ids is not None:
        refpic = ref_ids[jnp.clip(ref_idx, 0, ref_ids.shape[0] - 1)]
    else:
        refpic = ref_idx

    def edge(pi, qi, mb_edge):
        intra_e = blk_intra[pi] | blk_intra[qi]
        bsx = jnp.where(intra_e, jnp.where(mb_edge, 4, 3), 0)
        coeff = nz[pi] | nz[qi]
        mvd = (jnp.abs(mv[pi][..., 0] - mv[qi][..., 0]) >= 4) | \
              (jnp.abs(mv[pi][..., 1] - mv[qi][..., 1]) >= 4)
        refd = refpic[pi] != refpic[qi]
        inter_bs = jnp.where(coeff, 2, jnp.where(mvd | refd, 1, 0))
        return jnp.where(intra_e, bsx, inter_bs)

    col_edge = jnp.asarray((np.arange(1, gw) % 4) == 0)
    row_edge = jnp.asarray((np.arange(1, gh) % 4) == 0)
    bs_v = jnp.zeros((gh, gw), jnp.int32)
    bs_h = jnp.zeros((gh, gw), jnp.int32)
    bs_v = bs_v.at[:, 1:].set(edge((slice(None), slice(0, gw - 1)),
                                   (slice(None), slice(1, gw)),
                                   col_edge[None, :]))
    bs_h = bs_h.at[1:, :].set(edge((slice(0, gh - 1), slice(None)),
                                   (slice(1, gh), slice(None)),
                                   row_edge[:, None]))
    return bs_v, bs_h


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


def _deblock_tile_scan_intra(Yt, Ut, Vt, qp_t, mxs_t, mys_t, valid_t, bmax,
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
        roll1 = lambda x: _roll_lanes(x, 1)

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
        By = _roll_lanes(Tt, -1)
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
            Bc = _roll_lanes(Tc, -1)
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



def _fused_scan(intra_xs, has_inter, qp_t, mxs_t, mys_t, valid_t, bmax,
                alpha_off, beta_off, chroma_qp_off, second_chroma_qp_off,
                bsv_t, bsh_t):
    """One combined scan: intra wavefront recon + deblocking with a
    2-diagonal lag — halves the number of scan steps vs two passes.
    Returns deblocked (Y, U, V) tiles [n_steps, bmax, ...]."""
    alpha_t = jnp.asarray(DB.ALPHA_TABLE)
    beta_t = jnp.asarray(DB.BETA_TABLE)
    tc0_t = jnp.asarray(DB.TC0_TABLE).reshape(-1)
    tabs = (alpha_t, beta_t, tc0_t)
    cqt = jnp.asarray(T.CHROMA_QP)

    pad2 = lambda x: jnp.concatenate(
        [x, jnp.broadcast_to(jnp.zeros_like(x[0]), (2,) + x.shape[1:])])
    intra_xs_p = tuple(pad2(x) for x in intra_xs)
    db_xs_p = tuple(pad2(x) for x in
                    (qp_t, mxs_t, mys_t, valid_t, bsv_t, bsh_t))
    n_intra = len(intra_xs_p)

    def body(carry, xs):
        ci, cd = carry[:9], carry[9:]
        ixs = xs[:n_intra]
        (qp, mxs, mys, valid, bsv, bsh) = xs[n_intra:]
        ci2, (Ry, Ru, Rv) = _intra_step(ci, ixs, has_inter)
        cd2, ys = _deblock_step(cd, (Ry, Ru, Rv, qp, mxs, mys, valid,
                                     bsv, bsh),
                                tabs=tabs, cqt=cqt, alpha_off=alpha_off,
                                beta_off=beta_off,
                                chroma_qp_off=chroma_qp_off,
                                second_chroma_qp_off=second_chroma_qp_off)
        return ci2 + cd2, ys

    z16 = jnp.zeros((bmax, 16, 16), jnp.int32)
    z8 = jnp.zeros((bmax, 8, 8), jnp.int32)
    zq = jnp.zeros((bmax,), jnp.int32)
    carry0 = _intra_carry0(bmax) + (z16, z8, z8, z16, z8, z8, zq, zq, zq, zq)
    _, ys = jax.lax.scan(body, carry0, intra_xs_p + db_xs_p)
    Yd, Ud, Vd = ys
    return Yd[2:], Ud[2:], Vd[2:]


def _deblock_step(carry, xs, tabs, cqt, alpha_off, beta_off,
                  chroma_qp_off, second_chroma_qp_off):
    """One wavefront step of deblocking (module-level for the fused scan).
    Emits the finalized diagonal t-2."""
    (Ay, Au, Av, By, Bu, Bv, qA, qB, vA, vB) = carry
    (R, Ru, Rv, qp, mxs, mys, valid, bsv, bsh) = xs

    def qav(qa, qb):
        return (qa + qb + 1) >> 1

    act = valid == 1
    roll1 = lambda x: _roll_lanes(x, 1)

    q_left = qA
    q_top = roll1(qB)
    actm = act.astype(jnp.int32)[:, None]

    def lines16(bs_sub):
        # [B,4] per-subedge -> [B,16] per line, masked by act
        return jnp.repeat(bs_sub, 4, axis=1) * actm

    # ---------- luma vertical edges ----------
    qa0 = qav(qp, q_left)
    ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
    ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
    Pn, Qn = _edge_v_luma(Ay[:, :, 12:16], R[:, :, 0:4],
                  lines16(bsv[:, 0]), ia0, ib0, tabs)
    Ay = Ay.at[:, :, 12:16].set(Pn)
    R = R.at[:, :, 0:4].set(Qn)
    ia = jnp.clip(qp + alpha_off, 0, 51)[:, None]
    ib = jnp.clip(qp + beta_off, 0, 51)[:, None]
    for e in (1, 2, 3):
        x = 4 * e
        Pn, Qn = _edge_v_luma(R[:, :, x - 4:x], R[:, :, x:x + 4],
                  lines16(bsv[:, e]), ia, ib, tabs)
        R = R.at[:, :, x - 4:x].set(Pn)
        R = R.at[:, :, x:x + 4].set(Qn)

    # ---------- luma horizontal edges ----------
    Tt = roll1(By)
    qa0 = qav(qp, q_top)
    ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
    ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
    Pn, Qn = _edge_h_luma(Tt[:, 12:16, :], R[:, 0:4, :],
                  lines16(bsh[:, 0]), ia0, ib0, tabs)
    Tt = Tt.at[:, 12:16, :].set(Pn)
    R = R.at[:, 0:4, :].set(Qn)
    By = _roll_lanes(Tt, -1)
    for e in (1, 2, 3):
        y = 4 * e
        Pn, Qn = _edge_h_luma(R[:, y - 4:y, :], R[:, y:y + 4, :],
                  lines16(bsh[:, e]), ia, ib, tabs)
        R = R.at[:, y - 4:y, :].set(Pn)
        R = R.at[:, y:y + 4, :].set(Qn)

    # ---------- chroma ----------
    def lines8(bs_sub):
        return jnp.repeat(bs_sub, 2, axis=1) * actm

    new_c = []
    for (Ac, Bc, Rc, off) in ((Au, Bu, Ru, chroma_qp_off),
                  (Av, Bv, Rv, second_chroma_qp_off)):
        qc = cqt[jnp.clip(qp + off, 0, 51)]
        qc_l = cqt[jnp.clip(q_left + off, 0, 51)]
        qc_t = cqt[jnp.clip(q_top + off, 0, 51)]
        # vertical: chroma edge at cx=0 / cx=4 uses luma edge 0 / 2 bS
        qa0 = qav(qc, qc_l)
        ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
        ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
        Pn, Qn = _edge_v_chroma(Ac[:, :, 6:8], Rc[:, :, 0:2],
                    lines8(bsv[:, 0]), ia0, ib0, tabs)
        Ac = Ac.at[:, :, 6:8].set(Pn)
        Rc = Rc.at[:, :, 0:2].set(Qn)
        iac = jnp.clip(qc + alpha_off, 0, 51)[:, None]
        ibc = jnp.clip(qc + beta_off, 0, 51)[:, None]
        Pn, Qn = _edge_v_chroma(Rc[:, :, 2:4], Rc[:, :, 4:6],
                    lines8(bsv[:, 2]), iac, ibc, tabs)
        Rc = Rc.at[:, :, 2:4].set(Pn)
        Rc = Rc.at[:, :, 4:6].set(Qn)
        # horizontal edges
        Tc = roll1(Bc)
        qa0 = qav(qc, qc_t)
        ia0 = jnp.clip(qa0 + alpha_off, 0, 51)[:, None]
        ib0 = jnp.clip(qa0 + beta_off, 0, 51)[:, None]
        Pn, Qn = _edge_h_chroma(Tc[:, 6:8, :], Rc[:, 0:2, :],
                    lines8(bsh[:, 0]), ia0, ib0, tabs)
        Tc = Tc.at[:, 6:8, :].set(Pn)
        Rc = Rc.at[:, 0:2, :].set(Qn)
        Bc = _roll_lanes(Tc, -1)
        Pn, Qn = _edge_h_chroma(Rc[:, 2:4, :], Rc[:, 4:6, :],
                    lines8(bsh[:, 2]), iac, ibc, tabs)
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


def _deblock_tile_scan(Yt, Ut, Vt, qp_t, mxs_t, mys_t, valid_t, bmax,
                       alpha_off, beta_off, chroma_qp_off,
                       second_chroma_qp_off, bs_v_t, bs_h_t):
    """Yt/Ut/Vt: skewed recon tiles [n_steps, bmax, ...]; bs_v_t/bs_h_t:
    skewed per-edge boundary strengths [n_steps, bmax, 4(edge), 4(subedge)]
    (0 where an edge must not filter, incl. frame/picture boundaries).
    Returns same-shape deblocked tiles (diagonal d emitted at step d+2)."""
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
    bsv_x = pad3(bs_v_t, jnp.zeros_like(bs_v_t[0]))
    bsh_x = pad3(bs_h_t, jnp.zeros_like(bs_h_t[0]))

    def qav(qa, qb):
        return (qa + qb + 1) >> 1

    body = functools.partial(_deblock_step, tabs=tabs, cqt=cqt,
                             alpha_off=alpha_off, beta_off=beta_off,
                             chroma_qp_off=chroma_qp_off,
                             second_chroma_qp_off=second_chroma_qp_off)
    del qav

    # carry layout: (Ay, Au, Av, By, Bu, Bv, qA, qB, vA, vB)
    # with A = diagonal t-1, B = diagonal t-2
    z16 = jnp.zeros((bmax, 16, 16), jnp.int32)
    z8 = jnp.zeros((bmax, 8, 8), jnp.int32)
    zq = jnp.zeros((bmax,), jnp.int32)
    carry0 = (z16, z8, z8, z16, z8, z8, zq, zq, zq, zq)
    _, ys = jax.lax.scan(body, carry0,
                         (Yt_x, Ut_x, Vt_x, qp_x, mxs_x, mys_x, val_x,
                          bsv_x, bsh_x))
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
    """Tile-space device decode of an intra frame."""
    return _decode_core(mbh, mbw, mb_class, qp, i4_modes, i16_mode,
                        chroma_mode, luma_coeffs, luma_dc, chroma_coeffs,
                        chroma_dc, avail_left, avail_top, avail_topright,
                        alpha_off, beta_off, chroma_qp_off,
                        second_chroma_qp_off, deblock,
                        None, None, None, None, None)


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "deblock"))
def decode_frame_inter(mbh: int, mbw: int, mb_class, qp, i4_modes, i16_mode,
                       chroma_mode, luma_coeffs, luma_dc, chroma_coeffs,
                       chroma_dc, avail_left, avail_top, avail_topright,
                       alpha_off, beta_off, chroma_qp_off,
                       second_chroma_qp_off, mv, ref_idx, ref_y, ref_u, ref_v,
                       deblock: bool = True, wp=None, wp_logwd=None,
                       ref_ids=None):
    """Device decode of a P frame: batched MC (wavefront-free) + intra
    wavefront for intra MBs + bS-driven deblock. ref_*: [n_refs, ...] padded
    reference planes (prep_ref_planes), list0 order. wp: explicit
    pred_weight_table LUT [R, 6] + wp_logwd [2] (8.4.2.3.2), or None."""
    return _decode_core(mbh, mbw, mb_class, qp, i4_modes, i16_mode,
                        chroma_mode, luma_coeffs, luma_dc, chroma_coeffs,
                        chroma_dc, avail_left, avail_top, avail_topright,
                        alpha_off, beta_off, chroma_qp_off,
                        second_chroma_qp_off, deblock,
                        mv, ref_idx, ref_y, ref_u, ref_v,
                        wp=wp, wp_logwd=wp_logwd, ref_ids=ref_ids)


def _decode_core(mbh: int, mbw: int, mb_class, qp, i4_modes, i16_mode,
                 chroma_mode, luma_coeffs, luma_dc, chroma_coeffs, chroma_dc,
                 avail_left, avail_top, avail_topright,
                 alpha_off, beta_off, chroma_qp_off, second_chroma_qp_off,
                 deblock, mv, ref_idx, ref_y, ref_u, ref_v,
                 wp=None, wp_logwd=None, ref_ids=None):
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

    has_inter = mv is not None
    resid_y, resid_u, resid_v = _residuals(
        luma_coeffs, luma_dc, chroma_coeffs, chroma_dc, qp, mb_class,
        chroma_qp_off, second_chroma_qp_off)

    inter_args = (None, None, None)
    if has_inter:
        mv = mv.astype(jnp.int32)
        ref_idx = ref_idx.astype(jnp.int32)
        mc_y = _mc_luma_batched(ref_y.astype(jnp.int32), mv, ref_idx, mbh, mbw)
        mc_u = _mc_chroma_batched(ref_u.astype(jnp.int32), mv, ref_idx, mbh, mbw)
        mc_v = _mc_chroma_batched(ref_v.astype(jnp.int32), mv, ref_idx, mbh, mbw)
        if wp is not None:
            # explicit weighted prediction (8.4.2.3.2): clipped weighted
            # sample per cell, LUT-indexed by the cell's list-0 ref index
            wpj = wp.astype(jnp.int32)
            rw = jnp.clip(ref_idx, 0, wpj.shape[0] - 1)

            def w_apply(mc, wi, oi, ld):
                w = wpj[rw, wi][..., None, None]
                o = wpj[rw, oi][..., None, None]
                rnd = jnp.where(ld >= 1, 1 << jnp.maximum(ld - 1, 0), 0)
                return jnp.clip(((mc * w + rnd) >> jnp.maximum(ld, 0)) + o,
                                0, 255)

            ldy = wp_logwd[0].astype(jnp.int32)
            ldc = wp_logwd[1].astype(jnp.int32)
            mc_y = w_apply(mc_y, 0, 1, ldy)
            mc_u = w_apply(mc_u, 2, 3, ldc)
            mc_v = w_apply(mc_v, 4, 5, ldc)
        rec_y = jnp.clip(mc_y + resid_y, 0, 255)
        # chroma residual blocks are on the [mbh*2, mbw*2] 4x4 grid; MC is on
        # the [mbh*4, mbw*4] 2x2 grid -> assemble both as planes and add
        def c_plane_from22(mc):
            gh, gw = mc.shape[0], mc.shape[1]
            return mc.transpose(0, 2, 1, 3).reshape(gh * 2, gw * 2)

        def c_plane_from44(rs):
            gh, gw = rs.shape[0], rs.shape[1]
            return rs.transpose(0, 2, 1, 3).reshape(gh * 4, gw * 4)

        rec_u = jnp.clip(c_plane_from22(mc_u) + c_plane_from44(resid_u), 0, 255)
        rec_v = jnp.clip(c_plane_from22(mc_v) + c_plane_from44(resid_v), 0, 255)
        inter_y_t = _skew(_to_tiles(
            rec_y, mbh, mbw, 4), mys_j, mxs_j)
        cu = rec_u.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3)
        cv = rec_v.reshape(mbh, 8, mbw, 8).transpose(0, 2, 1, 3)
        inter_u_t = _skew(cu, mys_j, mxs_j)
        inter_v_t = _skew(cv, mys_j, mxs_j)
        inter_args = (inter_y_t, inter_u_t, inter_v_t)

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

    intra_xs = (resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t, i16_t,
                cmode_t, a_l_t, a_t_t, a_tr_t, valid_j) + (
                    inter_args if has_inter else ())
    if deblock and not has_inter:
        # all-intra frames: bS is the constant 4/3 pattern (frame-edge 0) —
        # the dedicated scan variant avoids the per-edge bS plane traffic
        Yt, Ut, Vt = _intra_tile_scan(resid_y_t, resid_u_t, resid_v_t,
                                      modes_t, cls_t, i16_t, cmode_t, a_l_t,
                                      a_t_t, a_tr_t, valid_j, bmax,
                                      *inter_args)
        Yt, Ut, Vt = _deblock_tile_scan_intra(
            Yt, Ut, Vt, qp_t, mxs_j, mys_j, valid_j, bmax, alpha_off,
            beta_off, chroma_qp_off, second_chroma_qp_off)
    elif deblock:
        nz_blk = jnp.any(luma_coeffs != 0, axis=(-1, -2)).astype(jnp.int32)
        bs_v, bs_h = _bs_planes(mb_class, nz_blk, mv, ref_idx, ref_ids)
        # reshape to per-MB [4(edge/col), 4(sub)] and skew
        bsv_mb = bs_v.reshape(mbh, 4, mbw, 4).transpose(0, 2, 3, 1)
        bsh_mb = bs_h.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3)
        bsv_t = _skew(bsv_mb, mys_j, mxs_j)
        bsh_t = _skew(bsh_mb, mys_j, mxs_j)
        if FUSED_SCAN:
            # one combined scan (half the steps, but the larger body defeats
            # XLA's cross-step pipelining on v5e: measured 2.4x SLOWER than
            # the split scans at 1080p — kept for future re-evaluation)
            Yt, Ut, Vt = _fused_scan(intra_xs, has_inter, qp_t, mxs_j, mys_j,
                                     valid_j, bmax, alpha_off, beta_off,
                                     chroma_qp_off, second_chroma_qp_off,
                                     bsv_t, bsh_t)
        else:
            Yt, Ut, Vt = _intra_tile_scan(
                resid_y_t, resid_u_t, resid_v_t, modes_t, cls_t, i16_t,
                cmode_t, a_l_t, a_t_t, a_tr_t, valid_j, bmax, *inter_args)
            Yt, Ut, Vt = _deblock_tile_scan(
                Yt, Ut, Vt, qp_t, mxs_j, mys_j, valid_j, bmax, alpha_off,
                beta_off, chroma_qp_off, second_chroma_qp_off, bsv_t, bsh_t)
    else:
        Yt, Ut, Vt = _intra_tile_scan(resid_y_t, resid_u_t, resid_v_t, modes_t,
                                      cls_t, i16_t, cmode_t, a_l_t, a_t_t,
                                      a_tr_t, valid_j, bmax, *inter_args)
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


def pad_ref_device(Y, U, V):
    """Pad a decoded frame (uint8 device arrays) for use as an MC reference;
    stays on device."""
    return (jnp.pad(Y.astype(jnp.int32), MC_PAD, mode="edge"),
            jnp.pad(U.astype(jnp.int32), MC_PAD // 2, mode="edge"),
            jnp.pad(V.astype(jnp.int32), MC_PAD // 2, mode="edge"))


def decode_frame_symbols_inter(fs, refs, deblock=None, ref_ids=None):
    """FrameSymbols of a P frame + device ref list [(Yp,Up,Vp), ...]
    (pad_ref_device, list0 order) -> (Y, U, V) uint8 numpy. ref_ids: per
    list-index picture identity for the deblock bS derivation."""
    if deblock is None:
        deblock = fs.deblock_enabled
    ref_y = jnp.stack([r[0] for r in refs])
    ref_u = jnp.stack([r[1] for r in refs])
    ref_v = jnp.stack([r[2] for r in refs])
    out = decode_frame_inter(
        fs.mb_height, fs.mb_width,
        jnp.asarray(fs.mb_class), jnp.asarray(fs.qp), jnp.asarray(fs.i4_modes),
        jnp.asarray(fs.i16_mode), jnp.asarray(fs.chroma_mode),
        jnp.asarray(fs.luma_coeffs), jnp.asarray(fs.luma_dc),
        jnp.asarray(fs.chroma_coeffs), jnp.asarray(fs.chroma_dc),
        jnp.asarray(fs.avail_left), jnp.asarray(fs.avail_top),
        jnp.asarray(fs.avail_topright),
        jnp.int32(fs.alpha_off), jnp.int32(fs.beta_off),
        jnp.int32(fs.chroma_qp_off), jnp.int32(fs.second_chroma_qp_off),
        jnp.asarray(fs.mv), jnp.asarray(fs.ref),
        ref_y, ref_u, ref_v, deblock=deblock,
        wp=(None if fs.wp is None else jnp.asarray(fs.wp)),
        wp_logwd=(None if fs.wp is None
                  else jnp.asarray(fs.wp_logwd, jnp.int32)),
        ref_ids=(None if ref_ids is None
                 else jnp.asarray(ref_ids, jnp.int32)))
    return out


def decode_frame_symbols_device(fs, deblock=None):
    """FrameSymbols -> (Y, U, V) uint8 DEVICE arrays via the tile kernel
    (no host sync: the session pops lazily for AsyncDepth overlap)."""
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
    return out


def decode_frame_symbols(fs, deblock=None):
    """FrameSymbols -> (Y, U, V) uint8 numpy via the tile kernel."""
    return tuple(np.asarray(p)
                 for p in decode_frame_symbols_device(fs, deblock))
