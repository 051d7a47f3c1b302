"""HEVC device reconstruction: plan tensors in, decoded frame out.

TPU-first structure (the reference performs all of this inside decode
silicon, intel_dec/intel_dec.cpp:722-741 HEVC plugin; here it is explicit):

  1. residuals   — per-TU-size batched dequant + inverse DCT/DST as exact
                   integer matmul pairs (hi/lo split keeps f32 MXU exact),
                   fully parallel over the frame
  2. intra scan  — CTB-diagonal wavefront (the proven diagonal-tile pattern
                   from the H.264 kernel, recon_tiles.py): lanes = CTB rows,
                   one lax.scan step per diagonal, an in-step z-order walk
                   over TU slots; prediction is gather-free (one-hot einsum
                   over static per-mode selection tables); reference-sample
                   availability is a zidx compare (z-scan order, 6.4.1)
  3. deblock     — HEVC's 8px edge grid never overlaps filter windows, so
                   both passes are whole-plane vectorized (no wavefront)
  4. SAO         — per-CTB params broadcast to pixels, one vectorized pass

Bit-exact vs the host reference decoder (codec/hevc/refdec.py) which is
itself bit-exact vs libavcodec on x265 streams.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.hevc import intra as HIP
from ..codec.hevc import transform as HTR
from ..codec.hevc.plan import ZIDX_NONE

# ---------------------------------------------------------------------------
# phase 1: residuals (dequant + inverse transform, batched per size)
# ---------------------------------------------------------------------------


def _exact_int_matmul(a, m):
    """a [..., n, n] int32 (|a| < 2^15ish), m [n, n] int32 (|m| <= 90):
    exact int32 a @ m via hi/lo f32 split (keeps the MXU, stays exact:
    each f32 dot is < 2^24)."""
    a_hi = (a >> 8).astype(jnp.float32)
    a_lo = (a & 0xFF).astype(jnp.float32)
    mf = m.astype(jnp.float32)
    hi = jnp.einsum("...ij,jk->...ik", a_hi, mf,
                    preferred_element_type=jnp.float32)
    lo = jnp.einsum("...ij,jk->...ik", a_lo, mf,
                    preferred_element_type=jnp.float32)
    return (hi.astype(jnp.int32) << 8) + lo.astype(jnp.int32)


def _dequant_blocks(c, qp, log2):
    """c [..., n, n] int32 levels, qp [...] int32 -> dequantized int32
    (spec 8.6.3, flat scaling list m=16, 8-bit)."""
    bd_shift = log2 + 3
    ls = jnp.asarray(HTR.LEVEL_SCALE)[qp % 6][..., None, None]
    s = (qp // 6)[..., None, None]
    d1 = c * (ls * 16)                      # |d1| <= 2^15 * 72*16 < 2^26
    # (d1 << s + 2^(bd_shift-1)) >> bd_shift, clipped to int16 range
    k = s - bd_shift                        # in [-8, 3]
    lo_path = (d1 + (1 << jnp.maximum(bd_shift - 1 - s, 0))) >> jnp.maximum(
        -k, 0)
    kp = jnp.maximum(k, 0)
    hi_path = jnp.where(d1 >= (1 << (15 - kp)), 32767,
                        jnp.where(d1 < -(1 << (15 - kp)), -32768, d1 << kp))
    d = jnp.where(k >= 0, hi_path, jnp.clip(lo_path, -32768, 32767))
    return d


def _itransform_blocks(d, log2, dst: bool):
    """Exact two-stage inverse transform (8.6.4.2) on [..., n, n] int32."""
    m = jnp.asarray(HTR.DST4 if dst else HTR.DCT[1 << log2])
    e = _exact_int_matmul(jnp.swapaxes(d, -1, -2), m)   # (M^T d)^T = d^T M
    e = jnp.swapaxes(e, -1, -2)
    e = jnp.clip((e + 64) >> 7, -32768, 32767)
    r = _exact_int_matmul(e, m)
    r = jnp.clip((r + 2048) >> 12, -32768, 32767)
    return r


def _residual_plane(coeff, qp_cell, tu_log2, luma: bool, sizes):
    """coeff [Hp, Wp] int32, qp_cell/tu_log2 [Hp/4, Wp/4] -> residual plane
    [Hp, Wp] int32 (zero where no TU / no coeffs)."""
    Hp, Wp = coeff.shape
    resid = jnp.zeros((Hp, Wp), jnp.int32)
    for log2 in sizes:
        n = 1 << log2
        c4 = n // 4
        blocks = coeff.reshape(Hp // n, n, Wp // n, n).transpose(0, 2, 1, 3)
        qp_b = qp_cell[::c4, ::c4]
        mask = (tu_log2[::c4, ::c4] == log2)
        d = _dequant_blocks(blocks, qp_b, log2)
        r = _itransform_blocks(d, log2, dst=(luma and log2 == 2))
        r = jnp.where(mask[..., None, None], r, 0)
        resid = resid + r.transpose(0, 2, 1, 3).reshape(Hp, Wp)
    return resid


# ---------------------------------------------------------------------------
# prediction tables (static per TU size): reference layout is the
# substitution-scan vector v[0..4n]: v[0]=p[-1][2n-1] (bottom-most left)
# ... v[2n-1]=p[-1][0], v[2n]=corner, v[2n+1..4n]=p[0..2n-1][-1]
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _pred_tables(n: int):
    """Returns numpy tables driving the angular prediction:
      EXTSEL [35, 3n+2, 4n+1]  main-ref construction (incl. invAngle
                                projection), one-hot over v
      OFFSEL [35, n, 2n+1]     per-row window offset one-hot
      FRAC   [35, n]           per-row fractional weight
      ISHOR  [35]              horizontal family (output transposed)
    """
    L = 4 * n + 1
    EXT = np.zeros((35, 3 * n + 2, L), np.float32)
    OFF = np.zeros((35, n, 2 * n + 1), np.float32)
    FRAC = np.zeros((35, n), np.int32)
    ISHOR = np.zeros(35, bool)

    def v_left(j):      # left[j] (downward) -> v index
        return 2 * n - 1 - j

    def v_top(i):
        return 2 * n + 1 + i

    V_CORNER = 2 * n
    base = n + 1
    for mode in range(2, 35):
        ang = HIP.ANGLES[mode - 2]
        hor = mode < 18
        ISHOR[mode] = hor
        # ref[base + i] = main[i]; main = top (vertical) or left (horizontal)
        src = np.full(3 * n + 2, -1, np.int64)
        for i in range(2 * n):
            src[base + i] = v_left(i) if hor else v_top(i)
        src[base - 1] = V_CORNER
        if ang < 0:
            inv = HIP.INV_ANGLE[ang]
            lo = (n * ang) >> 5
            for i in range(-1, lo - 1, -1):
                j = min((i * inv + 128) >> 8, 2 * n - 1) - 1
                if j < 0:
                    src[base + i - 1] = V_CORNER
                else:
                    src[base + i - 1] = v_top(j) if hor else v_left(j)
        for s in range(3 * n + 2):
            if src[s] >= 0:
                EXT[mode, s, src[s]] = 1.0
        for y in range(n):
            idx = ((y + 1) * ang) >> 5
            FRAC[mode, y] = ((y + 1) * ang) & 31
            OFF[mode, y, idx + n] = 1.0
    return EXT, OFF, FRAC, ISHOR


@functools.lru_cache(maxsize=8)
def _pred_idx_tables(n: int):
    """EXT/OFF are one-hot per row: collapse them to source-index tables
    so per-mode selection happens OUTSIDE the serial wavefront (a few
    int16 planes instead of a 35-way einsum per TU candidate).
    ext_idx[m, s] in [0, 4n] or 4n+1 ("no source" -> contributes 0);
    off_idx[m, y] in [0, 2n]."""
    EXT, OFF, _, _ = _pred_tables(n)
    L = 4 * n + 1
    ext_idx = np.full((35, 3 * n + 2), L, np.int32)
    off_idx = np.zeros((35, n), np.int32)
    for m in range(35):
        for srow in range(3 * n + 2):
            nz = np.nonzero(EXT[m, srow])[0]
            if len(nz):
                ext_idx[m, srow] = nz[0]
        for y in range(n):
            nz = np.nonzero(OFF[m, y])[0]
            if len(nz):
                off_idx[m, y] = nz[0]
    return ext_idx, off_idx


def _presel_idx_planes(mode_cell, sizes):
    """mode_cell [GH, GW] (4x4-cell mode map) -> {n: (ext_idx, off_idx)}
    per-TU-slot index planes ([GH*4/n, GW*4/n, 3n+2] / [..., n] int32),
    computed once per frame outside the scan (one-hot matmul, parallel)."""
    out = {}
    for log2 in sizes:
        n = 1 << log2
        n4 = n // 4
        msl = mode_cell[::n4, ::n4]
        oh = jax.nn.one_hot(msl, 35, dtype=jnp.float32)
        ext_t, off_t = _pred_idx_tables(n)
        ei = jnp.einsum("ghm,ms->ghs", oh,
                        jnp.asarray(ext_t, np.float32)).astype(jnp.int32)
        oi = jnp.einsum("ghm,my->ghy", oh,
                        jnp.asarray(off_t, np.float32)).astype(jnp.int32)
        out[n] = (ei, oi)
    return out


@functools.lru_cache(maxsize=8)
def _win_sel(n: int):
    """Static one-hot [3n+2, (2n+1)(n+1)]: win[s, k] = ext[1 + s + k]."""
    S = 3 * n + 2
    W = np.zeros((S, (2 * n + 1) * (n + 1)), np.float32)
    for s in range(2 * n + 1):
        for k in range(n + 1):
            W[1 + s + k, s * (n + 1) + k] = 1.0
    return W


@functools.lru_cache(maxsize=8)
def _filter_flags(n: int):
    """FILT[35]: [1 2 1]-smoothing applies (8.4.4.2.3), luma only."""
    if n == 4:
        return np.zeros(35, bool)
    log2 = n.bit_length() - 1
    thr = HIP._FILTER_THRESH[log2]
    f = np.zeros(35, bool)
    for mode in range(35):
        if mode == HIP.DC:
            continue
        if min(abs(mode - HIP.HOR), abs(mode - HIP.VER)) > thr:
            f[mode] = True
    return f


def _substitute(v, amask, bit_depth=8):
    """Reference-sample substitution (8.4.4.2.2), vectorized over lanes.
    v [l, L] int32, amask [l, L] bool.

    Gather-free: nearest-available propagation as associative scans (a
    take_along_axis here costs ~100x an elementwise op on TPU)."""
    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    ax = v.ndim - 1
    # forward: value of nearest available index <= j
    fwd_v, fwd_f = jax.lax.associative_scan(comb, (v, amask), axis=ax)
    # reverse: nearest available index >= j (fills the leading gap)
    rev_v, _ = jax.lax.associative_scan(comb, (v, amask), axis=ax,
                                        reverse=True)
    out = jnp.where(fwd_f, fwd_v, rev_v)
    any_avail = jnp.any(amask, axis=-1, keepdims=True)
    return jnp.where(any_avail, out, 1 << (bit_depth - 1))


def _filter_refs(v, n, strong_smoothing: bool):
    """[1 2 1] smoothing + (n==32) strong bilinear variant (8.4.4.2.3).
    Returns (v_121, strong_cond) — caller selects per lane/mode."""
    sm = (jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(1, 1)], mode="edge")
          [..., :-2] + 2 * v + jnp.pad(
              v, [(0, 0)] * (v.ndim - 1) + [(1, 1)], mode="edge")[..., 2:]
          + 2) >> 2
    sm = sm.at[..., 0].set(v[..., 0]).at[..., -1].set(v[..., -1])
    if n != 32 or not strong_smoothing:
        return sm, jnp.zeros(v.shape[:-1], bool)
    tl = v[..., 2 * n]
    bl = v[..., 0]
    tr = v[..., 4 * n]
    t_mid = v[..., 2 * n + 1 + n - 1]
    l_mid = v[..., 2 * n - 1 - (n - 1)]
    thr = 1 << 3
    cond = (jnp.abs(tl + tr - 2 * t_mid) < thr) & \
           (jnp.abs(tl + bl - 2 * l_mid) < thr)
    x = jnp.arange(2 * n - 1, dtype=jnp.int32)
    # left: v[0..2n-1] runs bottom-up; host writes nl (downward) so
    # nl[k] = ((2n-1-k)*tl + (k+1)*bl + 32) >> 6, v index = 2n-1-k
    k = jnp.arange(2 * n, dtype=jnp.int32)
    nl_down = ((2 * n - 1 - k) * tl[..., None] + (k + 1) * bl[..., None]
               + 32) >> 6
    nl_down = nl_down.at[..., 2 * n - 1].set(bl)
    nt = ((2 * n - 1 - k) * tl[..., None] + (k + 1) * tr[..., None] + 32) >> 6
    nt = nt.at[..., 2 * n - 1].set(tr)
    strong = jnp.concatenate(
        [nl_down[..., ::-1], tl[..., None], nt], axis=-1)
    del x
    return jnp.where(cond[..., None], strong, sm), cond


def _predict(vf, mode, n: int, is_chroma: bool, oh=None, ei=None, oi=None):
    """All 35 modes on substituted(+filtered) refs vf [l, 4n+1] with per-lane
    mode [l]. Returns pred [l, n, n] int32. vf must already be the correct
    filter variant per lane (DC/10/26 never filter so vf==v for them).
    With ei/oi (preselected per-lane source indices from
    _presel_idx_planes) the 35-way table selections are skipped — the
    dominant cost on the serial wavefront path."""
    EXT, OFF, FRAC, ISHOR = _pred_tables(n)
    L = 4 * n + 1
    if oh is None:
        oh = jax.nn.one_hot(mode, 35, dtype=jnp.float32)      # [l, 35]
    if ei is not None:
        extsel = (ei[:, :, None] == jnp.arange(L)[None, None]
                  ).astype(jnp.float32)                        # [l, 3n+2, L]
    else:
        extsel = jnp.einsum("lm,msr->lsr", oh, jnp.asarray(EXT))
    ext = jnp.einsum("lsr,lr->ls", extsel, vf.astype(jnp.float32))
    # windows of length n+1 starting at 1..2n+1, via one static one-hot
    # matmul (a python stack of 2n+1 slices costs 2n+1 sequential ops)
    win = (ext @ jnp.asarray(_win_sel(n))).reshape(
        -1, 2 * n + 1, n + 1)                                  # [l, 2n+1, n+1]
    if oi is not None:
        offsel = (oi[:, :, None] == jnp.arange(2 * n + 1)[None, None]
                  ).astype(jnp.float32)                        # [l, n, 2n+1]
    else:
        offsel = jnp.einsum("lm,myw->lyw", oh, jnp.asarray(OFF))
    seg = jnp.einsum("lyw,lwn->lyn", offsel, win).astype(jnp.int32)
    frac = jnp.einsum("lm,my->ly", oh,
                      jnp.asarray(FRAC, np.float32)).astype(jnp.int32)
    f = frac[..., None]
    ang = ((32 - f) * seg[:, :, :n] + f * seg[:, :, 1:] + 16) >> 5
    ishor = jnp.einsum("lm,m->l", oh,
                       jnp.asarray(ISHOR, np.float32)) > 0.5
    ang = jnp.where(ishor[:, None, None], jnp.swapaxes(ang, -1, -2), ang)

    # planar (mode 0) — on vf (filtered for n>=8 luma)
    xs = jnp.arange(n, dtype=jnp.int32)
    left = vf[:, 2 * n - 1::-1][:, :n + 1]      # left[0..n] downward
    top = vf[:, 2 * n + 1:][:, :n + 1]
    log2 = n.bit_length() - 1
    planar = ((n - 1 - xs)[None, None, :] * left[:, :n, None]
              + (xs + 1)[None, None, :] * top[:, n][:, None, None]
              + (n - 1 - xs)[None, :, None] * top[:, None, :n]
              + (xs + 1)[None, :, None] * left[:, n][:, None, None]
              + n) >> (log2 + 1)

    # DC (mode 1) — always unfiltered (vf==v for DC lanes)
    dc = (jnp.sum(vf[:, n:2 * n], axis=-1) + jnp.sum(
        vf[:, 2 * n + 1:3 * n + 1], axis=-1) + n) >> (log2 + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (vf.shape[0], n, n))
    if not is_chroma and n < 32:
        t_row = vf[:, 2 * n + 1:3 * n + 1]                    # top[0..n-1]
        l_col = vf[:, 2 * n - 1:n - 1:-1]                     # left[0..n-1]
        edge_t = (t_row + 3 * dc[:, None] + 2) >> 2
        edge_l = (l_col + 3 * dc[:, None] + 2) >> 2
        corner = (l_col[:, 0] + 2 * dc + t_row[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(edge_t)
        dcp = dcp.at[:, :, 0].set(edge_l)
        dcp = dcp.at[:, 0, 0].set(corner)

    out = jnp.where((mode == 0)[:, None, None], planar,
                    jnp.where((mode == 1)[:, None, None], dcp, ang))

    # pure vertical/horizontal edge filters (luma, n<32), clip to 8-bit
    if not is_chroma and n < 32:
        t_row = vf[:, 2 * n + 1:3 * n + 1]
        l_col = vf[:, 2 * n - 1:n - 1:-1]
        tl = vf[:, 2 * n]
        ver_col = jnp.clip(((l_col - tl[:, None]) >> 1) + t_row[:, 0:1],
                           0, 255)
        hor_row = jnp.clip(((t_row - tl[:, None]) >> 1) + l_col[:, 0:1],
                           0, 255)
        out = jnp.where((mode == 26)[:, None, None],
                        out.at[:, :, 0].set(ver_col), out)
        out = jnp.where((mode == 10)[:, None, None],
                        out.at[:, 0, :].set(hor_row), out)
    return out


# ---------------------------------------------------------------------------
# phase 2: intra reconstruction scan (CTB-diagonal wavefront)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _skew_geometry(ctb_h: int, ctb_w: int, skew: int):
    """Diagonal schedule d = cx + skew*cy, lane = cy. skew is chosen so every
    CTB a TU can read from (left/top/top-left/top-right extensions) sits on
    an earlier diagonal."""
    n_steps = ctb_w + skew * (ctb_h - 1)
    ks = np.arange(ctb_h)
    cys = np.broadcast_to(ks[None, :], (n_steps, ctb_h)).astype(np.int32)
    cxs = (np.arange(n_steps)[:, None] - skew * ks[None, :]).astype(np.int32)
    valid = ((cxs >= 0) & (cxs < ctb_w)).astype(np.int32)
    has_left = ((cxs > 0) & (cxs <= ctb_w)).astype(np.int32)
    cxs = np.clip(cxs, 0, ctb_w - 1)
    return cys, cxs, valid, has_left


def _plane_to_ctb_tiles(plane, ctb_h, ctb_w, C):
    return plane.reshape(ctb_h, C, ctb_w, C).transpose(0, 2, 1, 3)


def _slotplane_to_ctb_tiles(plane, ctb_h, ctb_w, spc):
    """[GH, GW, S] per-TU-slot plane (spc slots per CTB side) ->
    [ctb_h, ctb_w, spc, spc, S] tiles."""
    S = plane.shape[-1]
    return plane.reshape(ctb_h, spc, ctb_w, spc, S).transpose(0, 2, 1, 3, 4)


def _skewed_idx_tiles(mode_cell, ctb_h, ctb_w, C, max_tu, cys_j, cxs_j):
    """Preselected per-size source-index tiles, skewed for the scan:
    {n: (ei_t [steps, B, C/n, C/n, 3n+2], oi_t [..., n])}."""
    T = min(C, max_tu)
    sizes = []
    n = T
    while n >= 4:
        sizes.append(n.bit_length() - 1)
        n //= 2
    planes = _presel_idx_planes(mode_cell, sizes)
    out = {}
    for n, (ei, oi) in planes.items():
        spc = C // n
        out[n] = (
            _skew(_slotplane_to_ctb_tiles(ei, ctb_h, ctb_w, spc),
                  cys_j, cxs_j),
            _skew(_slotplane_to_ctb_tiles(oi, ctb_h, ctb_w, spc),
                  cys_j, cxs_j))
    return out


def _skew(arr, cys, cxs):
    return arr[cys, cxs]


def _unskew_to_plane(tiles, cys, cxs, valid, ctb_h, ctb_w, C):
    flat = jnp.where(valid == 1, cys * ctb_w + cxs, ctb_h * ctb_w).reshape(-1)
    out = jnp.zeros((ctb_h * ctb_w, C, C), tiles.dtype)
    out = out.at[flat].set(tiles.reshape(-1, C, C), mode="drop")
    return out.reshape(ctb_h, ctb_w, C, C).transpose(0, 2, 1, 3).reshape(
        ctb_h * C, ctb_w * C)


def _tu_candidate(F, Z, resid, tu_t, mode_t, x0, y0, n: int,
                  C: int, is_chroma: bool, strong: bool,
                  ei_t=None, oi_t=None):
    """Evaluate one TU candidate of size n at dynamic in-CTB position
    (x0, y0); write recon into the composite F where the tu map marks an
    n-sized TU there. F: [B, 1+C+PB, WF]; Z: [B, 1+C4+PB4, WZ] (cell zidx
    with the same +1 border); resid [B, C, C]; tu_t/mode_t [B, C4, C4]."""
    B = F.shape[0]
    n4 = n // 4
    cx0, cy0 = x0 >> 2, y0 >> 2
    log2 = n.bit_length() - 1

    def dyn(a, start, sizes):
        return jax.lax.dynamic_slice(a, start, sizes)

    z_org = dyn(Z, (0, 1 + cy0, 1 + cx0), (B, 1, 1))[:, 0, 0]
    # raw reference samples in substitution-scan order (F may be stored
    # int16 to halve the threaded-state bytes; compute stays int32)
    lcol = dyn(F, (0, y0 + 1, x0), (B, 2 * n, 1))[..., 0].astype(jnp.int32)
    corner = dyn(F, (0, y0, x0), (B, 1, 1))[:, 0, 0].astype(jnp.int32)
    trow = dyn(F, (0, y0, x0 + 1), (B, 1, 2 * n))[:, 0].astype(jnp.int32)
    v = jnp.concatenate([lcol[:, ::-1], corner[:, None], trow], axis=-1)
    # availability: zidx of the covering recon event strictly earlier
    zl = dyn(Z, (0, 1 + cy0, cx0), (B, 2 * n4, 1))[..., 0]
    zt = dyn(Z, (0, cy0, 1 + cx0), (B, 1, 2 * n4))[:, 0]
    zc = dyn(Z, (0, cy0, cx0), (B, 1, 1))[:, 0, 0]
    a_l = jnp.repeat((zl < z_org[:, None])[:, ::-1], 4, axis=-1)
    a_t = jnp.repeat(zt < z_org[:, None], 4, axis=-1)
    amask = jnp.concatenate(
        [a_l, (zc < z_org)[:, None], a_t], axis=-1)

    vs = _substitute(v, amask)
    mode = dyn(mode_t, (0, cy0, cx0), (B, 1, 1))[:, 0, 0]
    oh = jax.nn.one_hot(mode, 35, dtype=jnp.float32)
    if not is_chroma and n > 4:
        v121, _ = _filter_refs(vs, n, strong)
        filt = (oh @ jnp.asarray(_filter_flags(n), np.float32)) > 0.5
        vf = jnp.where(filt[:, None], v121, vs)
    else:
        vf = vs
    ei = oi = None
    if ei_t is not None:
        sx0, sy0 = x0 // n, y0 // n
        ei = dyn(ei_t, (0, sy0, sx0, 0), (B, 1, 1, 3 * n + 2))[:, 0, 0]
        oi = dyn(oi_t, (0, sy0, sx0, 0), (B, 1, 1, n))[:, 0, 0]
    pred = _predict(vf, mode, n, is_chroma, oh=oh, ei=ei, oi=oi)
    rblk = dyn(resid, (0, y0, x0), (B, n, n))
    rec = jnp.clip(pred + rblk, 0, 255)
    active = dyn(tu_t, (0, cy0, cx0), (B, 1, 1))[:, 0, 0] == log2
    cur = dyn(F, (0, y0 + 1, x0 + 1), (B, n, n))
    new = jnp.where(active[:, None, None], rec.astype(F.dtype), cur)
    return jax.lax.dynamic_update_slice(F, new, (0, y0 + 1, x0 + 1))


def _make_walk(C: int, max_tu: int, is_chroma: bool, strong: bool,
               unroll_below: int = 64):
    """Build the z-order TU-slot walk over one CTB tile: the quadtree's
    z-scan as nested loops from the largest candidate size down to 4, so
    every dependency is already in F when read.

    Levels at size <= unroll_below are Python-unrolled, INCLUDING the
    top-level slot loop when it qualifies. Full unroll (the default) keeps
    every slice offset a trace-time constant: with fori_loop the offsets
    are traced scalars and every read/write in _tu_candidate lowers to the
    TPU's dynamic-slice path, measured ~25x slower per candidate than
    static slices (1080p all-intra: 0.28 fps traced vs the static unroll;
    see bench history). Compile time pays for it once per geometry."""
    T = min(C, max_tu)
    # the top-slot z-order below is only correct for nt = C//T <= 2
    # (ADVICE r3: fail loudly if a future geometry breaks the layout)
    assert C // T <= 2, (C, T)

    def walk(F, Z, resid, tu_t, mode_t, idx=None):
        def level(sz):
            sub = None if sz == 4 else level(sz // 2)
            h = sz // 2

            def body_at(F, x0, y0):
                ei_t, oi_t = idx[sz] if idx is not None else (None, None)
                F = _tu_candidate(F, Z, resid, tu_t, mode_t, x0, y0,
                                  sz, C, is_chroma, strong,
                                  ei_t=ei_t, oi_t=oi_t)
                if sub is None:
                    return F
                if sz <= unroll_below:
                    for j in range(4):
                        F = sub(F, x0 + (j & 1) * h, y0 + (j >> 1) * h)
                else:
                    def child(j, F):
                        dx = (j & 1) * h
                        dy = (j >> 1) * h
                        return sub(F, x0 + dx, y0 + dy)
                    F = jax.lax.fori_loop(0, 4, child, F)
                return F
            return body_at

        top = level(T)
        nt = C // T
        if nt == 1:
            if T <= unroll_below:
                return top(F, 0, 0)
            return top(F, jnp.int32(0), jnp.int32(0))

        if T <= unroll_below:
            # static z-order over top-level slots: offsets stay Python ints
            for i in range(nt * nt):
                F = top(F, (i & 1) * T, (i >> 1) * T)
            return F

        def outer(i, F):
            # z-order over the top-level slots (nt is 1 or 2: CTB<=64, T>=16)
            x0 = (i & 1) * T
            y0 = (i >> 1) * T
            return top(F, x0, y0)
        return jax.lax.fori_loop(0, nt * nt, outer, F)
    return walk


def _zorder_candidates(C: int, max_tu: int):
    """The z-scan candidate list [(n, x0, y0), ...] the unrolled walk
    visits — the spec's TU quadtree order (every dependency precedes its
    reader)."""
    T = min(C, max_tu)
    assert C // T <= 2, (C, T)
    cands = []

    def level(sz, x0, y0):
        cands.append((sz, x0, y0))
        if sz > 4:
            h = sz // 2
            for j in range(4):
                level(h, x0 + (j & 1) * h, y0 + (j >> 1) * h)

    nt = C // T
    for i in range(nt * nt):
        level(T, (i & 1) * T, (i >> 1) * T)
    return cands


def _make_walk_switch(C: int, max_tu: int, is_chroma: bool, strong: bool):
    """fori_loop-over-candidates walk: one lax.switch whose branches each
    evaluate one z-order candidate at STATIC offsets. The composite F is a
    loop carry, which XLA buffer-assigns in place — the straight-line
    unrolled walk instead materializes a fresh F per candidate (measured
    ~205us/candidate at 1080p batch shapes, pure HBM copy). Same candidate
    order and arithmetic as _make_walk, so bit-exactness is unchanged."""

    def walk(F, Z, resid, tu_t, mode_t, idx=None):
        def make_branch(n, x0, y0):
            ei_t, oi_t = idx[n] if idx is not None else (None, None)

            def br(Fc):
                return _tu_candidate(Fc, Z, resid, tu_t, mode_t, x0, y0,
                                     n, C, is_chroma, strong,
                                     ei_t=ei_t, oi_t=oi_t)
            return br

        branches = [make_branch(*c) for c in _zorder_candidates(C, max_tu)]

        def body(i, Fc):
            return jax.lax.switch(i, branches, Fc)
        return jax.lax.fori_loop(0, len(branches), body, F)
    return walk


def resolve_walk(walk=None) -> str:
    """Resolve the TU-walk variant to a STATIC jit argument (ADVICE r3 #1:
    no trace-time env reads in the product path). None -> the JMX_HEVC_WALK
    env override if set, else the backend default: the Pallas VMEM walk on
    TPU (one dispatch walks a whole scan step's ~340 candidates with the
    composite resident in VMEM), the XLA unrolled walk elsewhere (Pallas
    interpret mode on CPU is test-only). All variants are asserted
    bit-identical by tests/test_hevc_walk_variants + the conformance
    suite."""
    if walk is None:
        walk = os.environ.get("JMX_HEVC_WALK", "")
    if not walk:
        walk = "pallas" if jax.default_backend() == "tpu" else "unroll"
    assert walk in ("unroll", "switch", "pallas"), walk
    return walk


def _walk_factory(walk: str):
    if walk == "pallas":
        from .hevc_walk_pallas import make_pallas_walk
        return make_pallas_walk
    return _make_walk_switch if walk == "switch" else _make_walk


def _use_pallas_walk(walk: str) -> bool:
    """True when the Pallas walk is selected: the preselected index planes
    are not needed (mode tables are static kernel constants)."""
    return walk == "pallas"


def _f_dtype():
    return (jnp.int16 if os.environ.get("JMX_HEVC_F16", "0") == "1"
            else jnp.int32)


def _intra_scan(resid_t, zidx_t, tu_t, mode_t, valid_t, has_left_t,
                C: int, skew: int, max_tu: int, is_chroma: bool,
                strong: bool, groups: int = 1, base_t=None, idx_t=None,
                walk: str = "unroll"):
    """resid_t [steps, B, C, C]; cell-grid tiles [steps, B, C/4, C/4];
    valid/has_left [steps, B]. Returns recon tiles [steps, B, C, C].

    The lane axis holds `groups` independent stacks of CTB rows (chroma
    stacks cb+cr; frame batching stacks whole frames): the first lane of
    each stack has no top neighbour."""
    n_steps, B = resid_t.shape[:2]
    C4 = C // 4
    PB = min(C, max_tu)           # bottom padding (below-left extension)
    PB4 = PB // 4
    e = skew - 1
    WF = 1 + (1 + e) * C
    WZ = 1 + (1 + e) * C4
    # lane = cy within each stack
    nlane = B // groups
    lane_has_top = jnp.asarray(np.tile(np.arange(nlane) > 0, groups))
    walk = _walk_factory(walk)(C, max_tu, is_chroma, strong)
    fdt = _f_dtype()

    def body(carry, xs):
        Rpx, Rz, Cpx, Cz = carry
        if base_t is not None:
            resid, zw, tu, mode, valid, has_left, base, idx = xs
        else:
            resid, zw, tu, mode, valid, has_left, idx = xs
            base = None
        if not idx:
            idx = None
        roll1 = lambda x: jnp.roll(x, 1, axis=0)
        top_ext = jnp.concatenate(
            [roll1(Rpx[skew - 1 - j]) for j in range(e + 1)], axis=-1)
        ztop_ext = jnp.concatenate(
            [roll1(Rz[skew - 1 - j]) for j in range(e + 1)], axis=-1)
        tl_px = roll1(Rpx[skew])[:, -1]
        tl_z = roll1(Rz[skew])[:, -1]
        hl = has_left == 1

        F = jnp.zeros((B, 1 + C + PB, WF), fdt)
        if base is not None:
            # inter pictures: seed the tile interior with the MC+residual
            # reconstruction; intra TU recon events overwrite their areas
            F = F.at[:, 1:1 + C, 1:1 + C].set(base.astype(fdt))
        F = F.at[:, 0, 1:].set(top_ext.astype(fdt))
        F = F.at[:, 0, 0].set(tl_px.astype(fdt))
        F = F.at[:, 1:1 + C, 0].set(Cpx.astype(fdt))
        Z = jnp.full((B, 1 + C4 + PB4, WZ), ZIDX_NONE, jnp.int32)
        Z = Z.at[:, 1:1 + C4, 1:1 + C4].set(zw)
        Z = Z.at[:, 0, 1:].set(
            jnp.where(lane_has_top[:, None], ztop_ext, ZIDX_NONE))
        Z = Z.at[:, 1:1 + C4, 0].set(
            jnp.where(hl[:, None], Cz, ZIDX_NONE))
        Z = Z.at[:, 0, 0].set(
            jnp.where(lane_has_top & hl, tl_z, ZIDX_NONE))

        if base is not None:
            # inter pictures: whole diagonals are often intra-free (P/B
            # content) — skip the 340-candidate TU walk for those steps
            F = jax.lax.cond(jnp.any(tu > 0),
                             lambda f: walk(f, Z, resid, tu, mode, idx),
                             lambda f: f, F)
        else:
            F = walk(F, Z, resid, tu, mode, idx)
        Yw = F[:, 1:1 + C, 1:1 + C].astype(jnp.int32)

        vm = (valid == 1)
        new_row = jnp.where(vm[:, None], Yw[:, C - 1, :], 0)
        new_rz = jnp.where(vm[:, None], zw[:, C4 - 1, :], ZIDX_NONE)
        Rpx2 = jnp.concatenate([new_row[None], Rpx[:-1]], axis=0)
        Rz2 = jnp.concatenate([new_rz[None], Rz[:-1]], axis=0)
        Cpx2 = jnp.where(vm[:, None], Yw[:, :, C - 1], 0)
        Cz2 = jnp.where(vm[:, None], zw[:, :, C4 - 1], ZIDX_NONE)
        return (Rpx2, Rz2, Cpx2, Cz2), Yw

    carry0 = (jnp.zeros((skew + 1, B, C), jnp.int32),
              jnp.full((skew + 1, B, C4), ZIDX_NONE, jnp.int32),
              jnp.zeros((B, C), jnp.int32),
              jnp.full((B, C4), ZIDX_NONE, jnp.int32))
    xs = (resid_t, zidx_t, tu_t, mode_t, valid_t, has_left_t)
    if base_t is not None:
        xs = xs + (base_t,)
    xs = xs + (idx_t if idx_t is not None else {},)
    _, ys = jax.lax.scan(body, carry0, xs)
    return ys


# ---------------------------------------------------------------------------
# phase 3: deblocking (8.7.2) — whole-plane vectorized, V pass then H pass
# ---------------------------------------------------------------------------

_BETA_T = np.array([0] * 16 + [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                               18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38,
                               40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60,
                               62, 64], np.int32)
_TC_T = np.array([0] * 18 + [1] * 9 + [2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5,
                                       5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
                                       18, 20, 22, 24], np.int32)
# chroma QP mapping (Table 8-10), as a dense 0..57 lookup
_QPC_T = np.array([qpi if qpi < 30 else
                   (qpi - 6 if qpi > 43 else
                    [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37]
                    [qpi - 30]) for qpi in range(58)], np.int32)


def _deblock_luma_v(Y, bs_col, qp_p, qp_q, beta_off, tc_off):
    """Filter all vertical luma edges at x=8,16,... in one shot.
    Y [Hp, Wp]; bs_col/qp_p/qp_q [Hp/4, ne] per 4-row segment per edge."""
    Hp, Wp = Y.shape
    ne = Wp // 8 - 1
    win = Y[:, 4:4 + ne * 8].reshape(Hp // 4, 4, ne, 8)
    p = win[..., 3::-1]                      # [seg, line, edge, 4] p0..p3
    q = win[..., 4:8]
    qpl = (qp_p + qp_q + 1) >> 1             # [seg, edge]
    beta = jnp.asarray(_BETA_T)[jnp.clip(qpl + beta_off, 0, 51)]
    tc = jnp.asarray(_TC_T)[jnp.clip(qpl + 2 * (bs_col - 1) + tc_off, 0, 53)]

    d2 = lambda a: jnp.abs(a[..., 2] - 2 * a[..., 1] + a[..., 0])
    dp0, dp3 = d2(p[:, 0]), d2(p[:, 3])      # [seg, edge]
    dq0, dq3 = d2(q[:, 0]), d2(q[:, 3])
    dpq0, dpq3 = dp0 + dq0, dp3 + dq3
    d = dpq0 + dpq3
    act = (bs_col > 0) & (d < beta)

    def strong_i(i):
        dpq = dpq0 if i == 0 else dpq3
        return ((2 * dpq < (beta >> 2)) &
                (jnp.abs(p[:, i, :, 3] - p[:, i, :, 0]) +
                 jnp.abs(q[:, i, :, 0] - q[:, i, :, 3]) < (beta >> 3)) &
                (jnp.abs(p[:, i, :, 0] - q[:, i, :, 0]) <
                 ((5 * tc + 1) >> 1)))
    strong = strong_i(0) & strong_i(3)       # [seg, edge]

    tc_l = tc[:, None, :]                    # broadcast over lines
    p0, p1, p2, p3 = (p[..., 0], p[..., 1], p[..., 2], p[..., 3])
    q0, q1, q2, q3 = (q[..., 0], q[..., 1], q[..., 2], q[..., 3])
    cl = lambda v, r: jnp.clip(v, r - 2 * tc_l, r + 2 * tc_l)
    sp0 = cl((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3, p0)
    sp1 = cl((p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = cl((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = cl((p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3, q0)
    sq1 = cl((p0 + q0 + q1 + q2 + 2) >> 2, q1)
    sq2 = cl((p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3, q2)

    # weak
    delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    wact = jnp.abs(delta0) < tc_l * 10       # per line
    delta = jnp.clip(delta0, -tc_l, tc_l)
    wp0 = jnp.clip(p0 + delta, 0, 255)
    wq0 = jnp.clip(q0 - delta, 0, 255)
    side_thr = (beta + (beta >> 1)) >> 3
    dep = (dp0 + dp3 < side_thr)[:, None, :]
    deq = (dq0 + dq3 < side_thr)[:, None, :]
    tch = tc_l >> 1
    dpv = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -tch, tch)
    dqv = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -tch, tch)
    wp1 = jnp.clip(p1 + dpv, 0, 255)
    wq1 = jnp.clip(q1 + dqv, 0, 255)

    sm = (act & strong)[:, None, :]
    wk = (act & ~strong)[:, None, :] & wact
    np0 = jnp.where(sm, sp0, jnp.where(wk, wp0, p0))
    np1 = jnp.where(sm, sp1, jnp.where(wk & dep, wp1, p1))
    np2 = jnp.where(sm, sp2, p2)
    nq0 = jnp.where(sm, sq0, jnp.where(wk, wq0, q0))
    nq1 = jnp.where(sm, sq1, jnp.where(wk & deq, wq1, q1))
    nq2 = jnp.where(sm, sq2, q2)
    new = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    flat = new.reshape(Hp, ne * 8)
    return jnp.concatenate([Y[:, :4], flat, Y[:, 4 + ne * 8:]], axis=1)


def _deblock_chroma_v(P, bs_col, qp_p, qp_q, qp_off, tc_off):
    """P [Hc, Wc] one chroma plane; bs/qp per 4-row chroma segment per
    edge (edges at chroma x=8,16,...)."""
    Hc, Wc = P.shape
    ne = Wc // 8 - 1
    win = P[:, 6:6 + ne * 8].reshape(Hc // 4, 4, ne, 8)
    p1, p0, q0, q1 = (win[..., 0], win[..., 1], win[..., 2], win[..., 3])
    qpl = (qp_p + qp_q + 1) >> 1
    qpc = jnp.asarray(_QPC_T)[jnp.clip(qpl + qp_off, 0, 57)]
    tc = jnp.asarray(_TC_T)[jnp.clip(qpc + 2 + tc_off, 0, 53)]
    act = ((bs_col >= 2) & (tc > 0))[:, None, :]
    tc_l = tc[:, None, :]
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc_l, tc_l)
    np0 = jnp.where(act, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(act, jnp.clip(q0 - delta, 0, 255), q0)
    new = jnp.stack([p1, np0, nq0, q1], axis=-1)
    flat = jnp.concatenate([new, win[..., 4:8]], axis=-1).reshape(Hc, ne * 8)
    return jnp.concatenate([P[:, :6], flat, P[:, 6 + ne * 8:]], axis=1)


def _deblock(Y, U, V, bs_ver, bs_hor, qp_cell, beta_off, tc_off,
             cb_qp_off, cr_qp_off):
    """Full HEVC deblock: luma+chroma V pass, then luma+chroma H pass."""
    def luma_pass(Yp, bs_map, qp_map):
        ne = Yp.shape[1] // 8 - 1
        bs = bs_map[:, 2::2][:, :ne]
        qpp = qp_map[:, 1::2][:, :ne]
        qpq = qp_map[:, 2::2][:, :ne]
        return _deblock_luma_v(Yp, bs, qpp, qpq, beta_off, tc_off)

    def chroma_pass(Pp, bs_map, qp_map, off):
        ne = Pp.shape[1] // 8 - 1
        bs = bs_map[0::2, 4::4][:, :ne]
        qpp = qp_map[0::2, 3::4][:, :ne]
        qpq = qp_map[0::2, 4::4][:, :ne]
        return _deblock_chroma_v(Pp, bs, qpp, qpq, off, tc_off)

    Y = luma_pass(Y, bs_ver, qp_cell)
    U = chroma_pass(U, bs_ver, qp_cell, cb_qp_off)
    V = chroma_pass(V, bs_ver, qp_cell, cr_qp_off)
    Y = luma_pass(Y.T, bs_hor.T, qp_cell.T).T
    U = chroma_pass(U.T, bs_hor.T, qp_cell.T, cb_qp_off).T
    V = chroma_pass(V.T, bs_hor.T, qp_cell.T, cr_qp_off).T
    return Y, U, V


# ---------------------------------------------------------------------------
# phase 4: SAO (8.7.3) — per-CTB params broadcast to pixels
# ---------------------------------------------------------------------------


def _sao_plane(plane, typ, offs, band, eo, log2n: int, pw: int, ph: int):
    """plane [H, W] post-deblock; typ/band/eo [ctbh, ctbw]; offs
    [ctbh, ctbw, 4]. log2n = CTB size in THIS plane's coords."""
    H, W = plane.shape
    n = 1 << log2n
    up = lambda a: jnp.repeat(jnp.repeat(a, n, 0), n, 1)[:H, :W]
    T = up(typ)
    B = up(band)
    E = up(eo)
    O = [up(offs[..., k]) for k in range(4)]
    src = plane

    # band offsets
    b = src >> 3
    badd = jnp.zeros_like(src)
    for k in range(4):
        badd = badd + jnp.where(b == ((B + k) & 31), O[k], 0)

    # edge offsets, all 4 classes then select. The per-pixel category
    # lookup is a chain of vector selects, NOT a gather: per-element
    # take_along_axis lowers to the TPU's scalar gather path (measured
    # ~4 s/16-frame batch — 60x the rest of the filter pipeline).
    pad = jnp.pad(src, 1, mode="edge")
    ys_, xs_ = jnp.mgrid[0:H, 0:W]
    eadd = jnp.zeros_like(src)
    for c, (dx, dy) in enumerate(((1, 0), (0, 1), (1, 1), (-1, 1))):
        na = pad[1 - dy:1 - dy + H, 1 - dx:1 - dx + W]
        nb = pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        sgn = jnp.sign(src - na) + jnp.sign(src - nb)
        # EO category (Table 8-12): sgn -2->O[0], -1->O[1], 1->O[2],
        # 2->O[3], 0 -> no offset
        add_c = (jnp.where(sgn == -2, O[0], 0) +
                 jnp.where(sgn == -1, O[1], 0) +
                 jnp.where(sgn == 1, O[2], 0) +
                 jnp.where(sgn == 2, O[3], 0))
        valid = ((xs_ + dx >= 0) & (xs_ + dx < pw) & (xs_ - dx >= 0) &
                 (xs_ - dx < pw) & (ys_ + dy >= 0) & (ys_ + dy < ph) &
                 (ys_ - dy >= 0) & (ys_ - dy < ph))
        eadd = jnp.where((E == c) & valid, add_c, eadd)

    out = jnp.where(T == 1, jnp.clip(src + badd, 0, 255),
                    jnp.where(T == 2, jnp.clip(src + eadd, 0, 255), src))
    return out


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "Hp", "Wp", "log2_ctb", "strong", "deblock_on", "pw", "ph",
    "width", "height", "walk"))
def decode_frame_hevc(Hp: int, Wp: int, log2_ctb: int, strong: bool,
                      deblock_on: bool, pw: int, ph: int,
                      width: int, height: int,
                      coeff_y, tu_y, mode_y, zidx_y, qp_y,
                      coeff_cb, coeff_cr, tu_c, mode_c, zidx_c,
                      cb_qp_off, cr_qp_off, beta_off, tc_off,
                      bs_ver, bs_hor,
                      sao_type, sao_offsets, sao_band, sao_eo,
                      walk: str = "unroll"):
    """All-intra HEVC device decode from plan tensors -> (Y, U, V) uint8."""
    # tensors may arrive in compact transfer dtypes (_jc); upcast once
    i32 = lambda a: a.astype(jnp.int32)
    (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr, tu_c,
     mode_c, zidx_c, bs_ver, bs_hor, sao_type, sao_offsets, sao_band,
     sao_eo) = map(
        i32, (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr,
              tu_c, mode_c, zidx_c, bs_ver, bs_hor, sao_type,
              sao_offsets, sao_band, sao_eo))
    C = 1 << log2_ctb
    ctb_h, ctb_w = Hp // C, Wp // C
    maxtb = min(32, C)
    skew = 1 + (2 * maxtb + C - 1) // C     # top-right reach in CTBs + 1
    cys, cxs, valid, has_left = _skew_geometry(ctb_h, ctb_w, skew)
    cys_j, cxs_j = jnp.asarray(cys), jnp.asarray(cxs)
    valid_j = jnp.asarray(valid)
    hl_j = jnp.asarray(has_left)

    # ---- residuals (batched matmuls) ----
    resid_y = _residual_plane(coeff_y, qp_y, tu_y, True, (2, 3, 4, 5))
    qpc_cb = jnp.asarray(_QPC_T)[jnp.clip(qp_y[::2, ::2] + cb_qp_off, 0, 57)]
    qpc_cr = jnp.asarray(_QPC_T)[jnp.clip(qp_y[::2, ::2] + cr_qp_off, 0, 57)]
    resid_cb = _residual_plane(coeff_cb, qpc_cb, tu_c, False, (2, 3, 4))
    resid_cr = _residual_plane(coeff_cr, qpc_cr, tu_c, False, (2, 3, 4))

    # ---- luma scan ----
    t = lambda p, n: _skew(_plane_to_ctb_tiles(p, ctb_h, ctb_w, n),
                           cys_j, cxs_j)
    idx_y = (None if _use_pallas_walk(walk) else
             _skewed_idx_tiles(mode_y, ctb_h, ctb_w, C, 32, cys_j, cxs_j))
    Yt = _intra_scan(t(resid_y, C), t(zidx_y, C // 4), t(tu_y, C // 4),
                     t(mode_y, C // 4), valid_j, hl_j,
                     C, skew, 32, is_chroma=False, strong=strong,
                     idx_t=idx_y, walk=walk)
    Y = _unskew_to_plane(Yt, cys_j, cxs_j, valid_j, ctb_h, ctb_w, C)

    # ---- chroma scan (cb+cr stacked on the lane axis) ----
    Cc = C // 2
    cat2 = lambda a, b: jnp.concatenate([a, b], axis=1)
    rc = cat2(t(resid_cb, Cc), t(resid_cr, Cc))
    zc2 = cat2(t(zidx_c, Cc // 4), t(zidx_c, Cc // 4))
    tc2 = cat2(t(tu_c, Cc // 4), t(tu_c, Cc // 4))
    mc2 = cat2(t(mode_c, Cc // 4), t(mode_c, Cc // 4))
    v2 = cat2(valid_j, valid_j)
    h2 = cat2(hl_j, hl_j)
    if _use_pallas_walk(walk):
        idx_c = None
    else:
        idx_c1 = _skewed_idx_tiles(mode_c, ctb_h, ctb_w, Cc, 16,
                                   cys_j, cxs_j)
        idx_c = {n: (cat2(ei, ei), cat2(oi, oi))
                 for n, (ei, oi) in idx_c1.items()}
    Ct = _intra_scan(rc, zc2, tc2, mc2, v2, h2,
                     Cc, skew, 16, is_chroma=True, strong=False, groups=2,
                     idx_t=idx_c, walk=walk)
    U = _unskew_to_plane(Ct[:, :ctb_h], cys_j, cxs_j, valid_j,
                         ctb_h, ctb_w, Cc)
    V = _unskew_to_plane(Ct[:, ctb_h:], cys_j, cxs_j, valid_j,
                         ctb_h, ctb_w, Cc)

    # ---- in-loop filters ----
    if deblock_on:
        Y, U, V = _deblock(Y, U, V, bs_ver, bs_hor, qp_y, beta_off, tc_off,
                           cb_qp_off, cr_qp_off)
    Y = _sao_plane(Y, sao_type[..., 0], sao_offsets[..., 0, :],
                   sao_band[..., 0], sao_eo[..., 0], log2_ctb, pw, ph)
    U = _sao_plane(U, sao_type[..., 1], sao_offsets[..., 1, :],
                   sao_band[..., 1], sao_eo[..., 1], log2_ctb - 1,
                   pw // 2, ph // 2)
    V = _sao_plane(V, sao_type[..., 2], sao_offsets[..., 2, :],
                   sao_band[..., 2], sao_eo[..., 2], log2_ctb - 1,
                   pw // 2, ph // 2)

    # crop to the coded size only; the conformance-window output crop is a
    # host-side view so the session can keep coded planes for the DPB
    return (Y[:ph, :pw].astype(jnp.uint8),
            U[:ph // 2, :pw // 2].astype(jnp.uint8),
            V[:ph // 2, :pw // 2].astype(jnp.uint8))


def _batch_scan_body(Hp: int, Wp: int, log2_ctb: int, strong: bool,
                     coeff_y, tu_y, mode_y, zidx_y, qp_y,
                     coeff_cb, coeff_cr, tu_c, mode_c, zidx_c,
                     cb_qp_off, cr_qp_off, walk: str):
    """Residuals + both wavefront scans + unskew -> int32 (Y, U, V)
    coded-size plane batches (pre in-loop filters)."""
    # tensors arrive in compact transfer dtypes (stack_plans); upcast once
    i32 = lambda a: a.astype(jnp.int32)
    coeff_y, tu_y, mode_y, qp_y = map(i32, (coeff_y, tu_y, mode_y, qp_y))
    coeff_cb, coeff_cr, tu_c, mode_c = map(
        i32, (coeff_cb, coeff_cr, tu_c, mode_c))
    zidx_y, zidx_c = i32(zidx_y), i32(zidx_c)
    F = coeff_y.shape[0]
    C = 1 << log2_ctb
    ctb_h, ctb_w = Hp // C, Wp // C
    maxtb = min(32, C)
    skew = 1 + (2 * maxtb + C - 1) // C
    cys, cxs, valid, has_left = _skew_geometry(ctb_h, ctb_w, skew)
    cys_j, cxs_j = jnp.asarray(cys), jnp.asarray(cxs)
    valid_j = jnp.asarray(valid)
    hl_j = jnp.asarray(has_left)

    # ---- residuals ----
    resid_y = jax.vmap(lambda c, q, t: _residual_plane(
        c, q, t, True, (2, 3, 4, 5)))(coeff_y, qp_y, tu_y)
    qpc_cb = jnp.asarray(_QPC_T)[jnp.clip(
        qp_y[:, ::2, ::2] + cb_qp_off[:, None, None], 0, 57)]
    qpc_cr = jnp.asarray(_QPC_T)[jnp.clip(
        qp_y[:, ::2, ::2] + cr_qp_off[:, None, None], 0, 57)]
    rc_f = lambda c, q, t: _residual_plane(c, q, t, False, (2, 3, 4))
    resid_cb = jax.vmap(rc_f)(coeff_cb, qpc_cb, tu_c)
    resid_cr = jax.vmap(rc_f)(coeff_cr, qpc_cr, tu_c)

    # ---- luma scan: frames stacked on the lane axis ----
    def tf(planes, n):
        # planes [F, hp, wp] -> skewed tiles [steps, F*ctb_h, n, n]
        tiles = jax.vmap(lambda p: _skew(_plane_to_ctb_tiles(
            p, ctb_h, ctb_w, n), cys_j, cxs_j))(planes)
        return jnp.concatenate(list(tiles), axis=1)

    catF = lambda a: jnp.concatenate([a] * F, axis=1)

    def tf_idx(mode_cells, C_, max_tu_):
        if _use_pallas_walk(walk):
            return None
        per = [_skewed_idx_tiles(mode_cells[f], ctb_h, ctb_w, C_, max_tu_,
                                 cys_j, cxs_j) for f in range(F)]
        return {n: (jnp.concatenate([p[n][0] for p in per], axis=1),
                    jnp.concatenate([p[n][1] for p in per], axis=1))
                for n in per[0]}

    idx_y = tf_idx(mode_y, C, 32)
    Yt = _intra_scan(tf(resid_y, C), tf(zidx_y, C // 4), tf(tu_y, C // 4),
                     tf(mode_y, C // 4), catF(valid_j), catF(hl_j),
                     C, skew, 32, is_chroma=False, strong=strong, groups=F,
                     idx_t=idx_y, walk=walk)
    unsk = lambda t, n: _unskew_to_plane(t, cys_j, cxs_j, valid_j,
                                         ctb_h, ctb_w, n)
    Y = jnp.stack([unsk(Yt[:, f * ctb_h:(f + 1) * ctb_h], C)
                   for f in range(F)])

    # ---- chroma scan: F frames x (cb, cr) stacked ----
    Cc = C // 2
    rc = jnp.concatenate([tf(resid_cb, Cc), tf(resid_cr, Cc)], axis=1)
    zcs = tf(zidx_c, Cc // 4)
    tcs = tf(tu_c, Cc // 4)
    mcs = tf(mode_c, Cc // 4)
    cat2 = lambda a: jnp.concatenate([a, a], axis=1)
    idx_cf = tf_idx(mode_c, Cc, 16)
    idx_c = (None if idx_cf is None else
             {n: (cat2(ei), cat2(oi)) for n, (ei, oi) in idx_cf.items()})
    Ct = _intra_scan(rc, cat2(zcs), cat2(tcs), cat2(mcs),
                     cat2(catF(valid_j)), cat2(catF(hl_j)),
                     Cc, skew, 16, is_chroma=True, strong=False,
                     groups=2 * F, idx_t=idx_c, walk=walk)
    U = jnp.stack([unsk(Ct[:, f * ctb_h:(f + 1) * ctb_h], Cc)
                   for f in range(F)])
    V = jnp.stack([unsk(Ct[:, (F + f) * ctb_h:(F + f + 1) * ctb_h], Cc)
                   for f in range(F)])
    return Y, U, V


def _batch_filter_body(log2_ctb: int, deblock_on: bool, pw: int, ph: int,
                       width: int, height: int, Y, U, V, qp_y,
                       cb_qp_off, cr_qp_off, beta_off, tc_off,
                       bs_ver, bs_hor,
                       sao_type, sao_offsets, sao_band, sao_eo):
    """Deblock + SAO + conformance crop + uint8 on int32 plane batches."""
    i32 = lambda a: a.astype(jnp.int32)
    qp_y, bs_ver, bs_hor = map(i32, (qp_y, bs_ver, bs_hor))
    sao_type, sao_offsets = i32(sao_type), i32(sao_offsets)
    sao_band, sao_eo = i32(sao_band), i32(sao_eo)
    if deblock_on:
        Y, U, V = jax.vmap(
            lambda y, u, v, bv, bh, q, bo, to, cb, cr: _deblock(
                y, u, v, bv, bh, q, bo, to, cb, cr)
        )(Y, U, V, bs_ver, bs_hor, qp_y, beta_off, tc_off,
          cb_qp_off, cr_qp_off)
    sao_f = lambda pl, t, o, b, e, l2, w2, h2: jax.vmap(
        lambda p, tt, oo, bb, ee: _sao_plane(p, tt, oo, bb, ee, l2, w2, h2)
    )(pl, t, o, b, e)
    Y = sao_f(Y, sao_type[..., 0], sao_offsets[..., 0, :],
              sao_band[..., 0], sao_eo[..., 0], log2_ctb, pw, ph)
    U = sao_f(U, sao_type[..., 1], sao_offsets[..., 1, :],
              sao_band[..., 1], sao_eo[..., 1], log2_ctb - 1,
              pw // 2, ph // 2)
    V = sao_f(V, sao_type[..., 2], sao_offsets[..., 2, :],
              sao_band[..., 2], sao_eo[..., 2], log2_ctb - 1,
              pw // 2, ph // 2)
    return (Y[:, :height, :width].astype(jnp.uint8),
            U[:, :height // 2, :width // 2].astype(jnp.uint8),
            V[:, :height // 2, :width // 2].astype(jnp.uint8))


@jax.jit
def _widen_i32(*ts):
    """Device-side upcast of compact transfer tensors, as its OWN tiny
    program. Feeding int8/int16 tensors directly into the program that
    contains the Pallas walk kernels intermittently faults the TPU
    worker (r5 bisect: the same program is stable with i32 inputs and
    crashes with compact ones — narrowed to the compact-dtype operand
    path, not the kernel arithmetic). H2D stays compact; this adds one
    memory-bound dispatch (~1 ms for a 16-frame 1080p batch)."""
    return tuple(t.astype(jnp.int32) for t in ts)


decode_frames_hevc_scan = functools.partial(jax.jit, static_argnames=(
    "Hp", "Wp", "log2_ctb", "strong", "walk"))(_batch_scan_body)
decode_frames_hevc_filters = functools.partial(jax.jit, static_argnames=(
    "log2_ctb", "deblock_on", "pw", "ph", "width",
    "height"))(_batch_filter_body)


def decode_frames_hevc_batch(Hp: int, Wp: int, log2_ctb: int, strong: bool,
                             deblock_on: bool, pw: int, ph: int,
                             width: int, height: int,
                             coeff_y, tu_y, mode_y, zidx_y, qp_y,
                             coeff_cb, coeff_cr, tu_c, mode_c, zidx_c,
                             cb_qp_off, cr_qp_off, beta_off, tc_off,
                             bs_ver, bs_hor,
                             sao_type, sao_offsets, sao_band, sao_eo,
                             walk: str = "unroll"):
    """Batched all-intra HEVC decode: every tensor carries a leading frame
    axis [F, ...] (per-frame scalars are [F] int32). Frames are stacked on
    the wavefront's lane axis, so the sequential scan depth is amortized
    over the batch — this is the throughput shape for the sequential TU
    walk (one frame alone exposes only ctb_h lanes of parallelism).

    Runs as THREE device programs (widen, scan stage, filter stage): the
    monolithic program intermittently faults the TPU worker when the
    Pallas walk kernels share a program with compact int8/int16 operands
    (r5 bisect: the same scan program is stable with i32 inputs, crashes
    with compact ones). Bit-exactness is unchanged: the split is between
    whole pipeline phases and a dtype-preserving upcast."""
    (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr, tu_c,
     mode_c, zidx_c, bs_ver, bs_hor, sao_type, sao_offsets, sao_band,
     sao_eo) = _widen_i32(
        coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr, tu_c,
        mode_c, zidx_c, bs_ver, bs_hor, sao_type, sao_offsets, sao_band,
        sao_eo)
    Y, U, V = decode_frames_hevc_scan(
        Hp, Wp, log2_ctb, strong, coeff_y, tu_y, mode_y, zidx_y, qp_y,
        coeff_cb, coeff_cr, tu_c, mode_c, zidx_c, cb_qp_off, cr_qp_off,
        walk=walk)
    return decode_frames_hevc_filters(
        log2_ctb, deblock_on, pw, ph, width, height, Y, U, V, qp_y,
        cb_qp_off, cr_qp_off, beta_off, tc_off, bs_ver, bs_hor,
        sao_type, sao_offsets, sao_band, sao_eo)


def stack_plans(plans):
    """List of same-geometry HevcFramePlans -> the batched arg tuple for
    decode_frames_hevc_batch. Plan tensors travel host->device in compact
    dtypes (coeff levels are int16 by spec range; maps fit int8) — the
    device upcasts after transfer. This halves the H2D bytes, the usual
    bottleneck (SURVEY §7.4: HBM/PCIe bandwidth first)."""
    p0 = plans[0]
    st = lambda f, dt: jnp.asarray(np.stack([f(p) for p in plans])
                                   .astype(dt))
    sc = lambda f: jnp.asarray(np.array([f(p) for p in plans], np.int32))
    return ((p0.Hp, p0.Wp, p0.log2_ctb, bool(p0.strong_smoothing),
             not p0.deblock_disabled, p0.pw, p0.ph, p0.width, p0.height) +
            (st(lambda p: p.coeff_y, np.int16),
             st(lambda p: p.tu_log2_y, np.int8),
             st(lambda p: p.mode_y, np.int8),
             st(lambda p: p.zidx_y, np.int32),
             st(lambda p: p.qp_y, np.int8),
             st(lambda p: p.coeff_cb, np.int16),
             st(lambda p: p.coeff_cr, np.int16),
             st(lambda p: p.tu_log2_c, np.int8),
             st(lambda p: p.mode_c, np.int8),
             st(lambda p: p.zidx_c, np.int32)) +
            (sc(lambda p: p.cb_qp_off), sc(lambda p: p.cr_qp_off),
             sc(lambda p: p.beta_off), sc(lambda p: p.tc_off)) +
            (st(lambda p: p.bs_ver, np.int8),
             st(lambda p: p.bs_hor, np.int8),
             st(lambda p: p.sao_type, np.int8),
             st(lambda p: p.sao_offsets, np.int8),
             st(lambda p: p.sao_band, np.int8),
             st(lambda p: p.sao_eo, np.int8)))


def decode_plans_batch(plans):
    """Same-geometry HevcFramePlans -> batched (Y, U, V) uint8 [F, h, w]."""
    p0 = plans[0]
    key = (p0.Hp, p0.Wp, p0.log2_ctb, p0.strong_smoothing,
           p0.deblock_disabled, p0.width, p0.height)
    for p in plans:
        if not p.supported:
            raise NotImplementedError(f"plan unsupported: {p.reason}")
        if (p.Hp, p.Wp, p.log2_ctb, p.strong_smoothing,
                p.deblock_disabled, p.width, p.height) != key:
            raise NotImplementedError("mixed-geometry plan batch")
    args = stack_plans(plans)
    return decode_frames_hevc_batch(*args, walk=resolve_walk())


def _jc(a, dt):
    """Compact host->device transfer: cast on the HOST to the smallest
    lossless dtype, upcast on device (the jitted entries upcast to i32).
    The dev tunnel moves ~60 MB/s H2D, so transfer bytes bound session
    e2e fps (SURVEY §7.4) — int32 plan tensors would double/quadruple
    every picture's wire cost."""
    return jnp.asarray(np.asarray(a).astype(dt))


def decode_plan(plan, coded: bool = False):
    """HevcFramePlan -> (Y, U, V) uint8 device arrays; coded=True returns
    the full coded-size planes (pre conformance-window crop) for DPB use."""
    if not plan.supported:
        raise NotImplementedError(f"plan unsupported: {plan.reason}")
    wide = _widen_i32(
        _jc(plan.coeff_y, np.int16), _jc(plan.tu_log2_y, np.int8),
        _jc(plan.mode_y, np.int8), _jc(plan.zidx_y, np.int32),
        _jc(plan.qp_y, np.int8),
        _jc(plan.coeff_cb, np.int16), _jc(plan.coeff_cr, np.int16),
        _jc(plan.tu_log2_c, np.int8),
        _jc(plan.mode_c, np.int8), _jc(plan.zidx_c, np.int32),
        _jc(plan.bs_ver, np.int8), _jc(plan.bs_hor, np.int8),
        _jc(plan.sao_type, np.int8), _jc(plan.sao_offsets, np.int8),
        _jc(plan.sao_band, np.int8), _jc(plan.sao_eo, np.int8))
    Y, U, V = decode_frame_hevc(
        plan.Hp, plan.Wp, plan.log2_ctb, bool(plan.strong_smoothing),
        not plan.deblock_disabled, plan.pw, plan.ph,
        plan.width, plan.height,
        *wide[:10],
        jnp.int32(plan.cb_qp_off), jnp.int32(plan.cr_qp_off),
        jnp.int32(plan.beta_off), jnp.int32(plan.tc_off),
        *wide[10:],
        walk=resolve_walk())
    if coded:
        return Y, U, V
    h, w = plan.height, plan.width
    return Y[:h, :w], U[:h // 2, :w // 2], V[:h // 2, :w // 2]


# ---------------------------------------------------------------------------
# inter pictures (P/B): phase-plane motion compensation + device DPB
# ---------------------------------------------------------------------------
# The reference decodes inter pictures in silicon behind cuvidDecodePicture;
# here MC is a batched per-4x4-cell gather from precomputed fractional-phase
# plane pyramids (16 luma quarter-pel phases per reference; chroma keeps the
# 8 horizontal eighth-pel phases and applies the 4-tap vertical filter at
# gather time). Interpolated values are held at the spec's 14-bit
# intermediate precision so bi-prediction combines exactly (8.5.4.2.2).

MC_PAD_HEVC = 64   # luma pad; plan gates |mv| <= 4*(PAD-8) quarter-pel

_LUMA_F = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], np.int32)
_CHROMA_F = np.array([
    [0, 64, 0, 0], [-2, 58, 10, -2], [-4, 54, 16, -2], [-6, 46, 28, -4],
    [-4, 36, 36, -4], [-4, 28, 46, -6], [-2, 16, 54, -4],
    [-2, 10, 58, -2]], np.int32)


@jax.jit
def prep_hevc_ref(Y, U, V):
    """Coded-size uint8 planes -> (luma_ph [16, Hp2, Wp2] int16,
    cb_ph [8, ...], cr_ph [8, ...]) fractional-phase pyramids, padded by
    MC_PAD_HEVC (luma) / MC_PAD_HEVC//2 (chroma), 14-bit sample scale."""
    P = MC_PAD_HEVC
    y = jnp.pad(Y.astype(jnp.int32), P, mode="edge")

    def hconv8(a, f):
        ap = jnp.pad(a, ((0, 0), (3, 4)), mode="edge")
        return sum(int(f[k]) * ap[:, k:k + a.shape[1]] for k in range(8))

    def vconv8(a, f):
        ap = jnp.pad(a, ((3, 4), (0, 0)), mode="edge")
        return sum(int(f[k]) * ap[k:k + a.shape[0], :] for k in range(8))

    hor = [y << 6 if xf == 0 else hconv8(y, _LUMA_F[xf]) for xf in range(4)]
    phases = []
    for yf in range(4):
        for xf in range(4):
            if yf == 0:
                phases.append(hor[xf])
            else:
                phases.append(vconv8(hor[xf], _LUMA_F[yf]) >> 6)
    luma_ph = jnp.stack(phases).astype(jnp.int16)

    def hconv4(a, f):
        ap = jnp.pad(a, ((0, 0), (1, 2)), mode="edge")
        return sum(int(f[k]) * ap[:, k:k + a.shape[1]] for k in range(4))

    def chroma_ph(Cpl):
        c = jnp.pad(Cpl.astype(jnp.int32), P // 2, mode="edge")
        return jnp.stack(
            [c << 6 if xf == 0 else hconv4(c, _CHROMA_F[xf])
             for xf in range(8)]).astype(jnp.int16)

    return luma_ph, chroma_ph(U), chroma_ph(V)


def _mc_hevc_luma(ref_ph, mv, slot):
    """ref_ph [R, 16, Hp2, Wp2] int16; mv/slot per 4x4 cell ->
    [Hc, Wc, 4, 4] int32 14-bit prediction."""
    Hc, Wc = slot.shape
    ys_, xs_ = np.mgrid[0:Hc, 0:Wc]
    xi = xs_ * 4 + MC_PAD_HEVC + (mv[..., 0] >> 2)
    yi = ys_ * 4 + MC_PAD_HEVC + (mv[..., 1] >> 2)
    ph = (mv[..., 1] & 3) * 4 + (mv[..., 0] & 3)
    rows = yi[..., None, None] + np.arange(4)[:, None]
    cols = xi[..., None, None] + np.arange(4)[None, :]
    return ref_ph[slot[..., None, None], ph[..., None, None],
                  rows, cols].astype(jnp.int32)


def _mc_hevc_chroma(ref_ph, mv, slot):
    """ref_ph [R, 8, Hc2, Wc2] int16 horizontal phases; 4-tap vertical at
    gather time -> [Hc, Wc, 2, 2] int32 14-bit (per co-located 2x2 block)."""
    Hc, Wc = slot.shape
    ys_, xs_ = np.mgrid[0:Hc, 0:Wc]
    xi = xs_ * 2 + MC_PAD_HEVC // 2 + (mv[..., 0] >> 3)
    yi = ys_ * 2 + MC_PAD_HEVC // 2 + (mv[..., 1] >> 3)
    xf = mv[..., 0] & 7
    taps = jnp.asarray(_CHROMA_F)[mv[..., 1] & 7]       # [Hc, Wc, 4]
    rows = yi[..., None, None] + (np.arange(5) - 1)[:, None]
    cols = xi[..., None, None] + np.arange(2)[None, :]
    win = ref_ph[slot[..., None, None], xf[..., None, None],
                 rows, cols].astype(jnp.int32)          # [Hc, Wc, 5, 2]
    out = sum(taps[..., k, None, None] * win[..., k:k + 2, :]
              for k in range(4))
    return out >> 6


def _combine_pred(p0, p1, fl0, fl1, w0, o0, w1, o1, log2wd):
    """14-bit list predictions -> 8-bit samples. ONE uniform formula for
    default AND explicit weighted prediction (8.5.4.2.3.3): the default
    combine equals the explicit one at identity weights (w=1, o=0,
    denom=0, so log2wd=6), which is what the plan carries for unweighted
    slices. w/o are per-4x4-cell planes, log2wd a traced scalar."""
    e = lambda a: a[..., None, None]
    bi = (fl0 & fl1).astype(bool)[..., None, None]
    f0 = fl0.astype(bool)[..., None, None]
    w0e, o0e, w1e, o1e = e(w0), e(o0), e(w1), e(o1)
    half = jnp.left_shift(jnp.int32(1), log2wd - 1)
    bi_v = (p0 * w0e + p1 * w1e +
            ((o0e + o1e + 1) << log2wd)) >> (log2wd + 1)
    uni0 = ((p0 * w0e + half) >> log2wd) + o0e
    uni1 = ((p1 * w1e + half) >> log2wd) + o1e
    out = jnp.where(bi, bi_v, jnp.where(f0, uni0, uni1))
    return jnp.clip(out, 0, 255)


def _cells_to_plane_j(cells):
    gh, gw, n, _ = cells.shape
    return cells.transpose(0, 2, 1, 3).reshape(gh * n, gw * n)


@functools.partial(jax.jit, static_argnames=(
    "Hp", "Wp", "log2_ctb", "strong", "deblock_on", "pw", "ph", "walk"))
def decode_frame_hevc_inter(Hp: int, Wp: int, log2_ctb: int, strong: bool,
                            deblock_on: bool, pw: int, ph: int,
                            coeff_y, tu_y, mode_y, zidx_y, qp_y,
                            coeff_cb, coeff_cr, tu_c, mode_c, zidx_c,
                            cb_qp_off, cr_qp_off, beta_off, tc_off,
                            bs_ver, bs_hor,
                            sao_type, sao_offsets, sao_band, sao_eo,
                            inter4, mv, ref_slot, pred_fl,
                            tu_inter_y, tu_inter_c,
                            wp_w, luma_log2wd, chroma_log2wd,
                            refs_y, refs_cb, refs_cr,
                            walk: str = "unroll"):
    """Inter (P/B) HEVC device decode: phase-plane MC + inter residuals
    seed the intra wavefront; deblock bS comes precomputed from the host
    (full 8.7.2.4 derivation incl. motion comparisons). Returns coded-size
    (Y, U, V) uint8."""
    C = 1 << log2_ctb
    ctb_h, ctb_w = Hp // C, Wp // C
    maxtb = min(32, C)
    skew = 1 + (2 * maxtb + C - 1) // C
    cys, cxs, valid, has_left = _skew_geometry(ctb_h, ctb_w, skew)
    cys_j, cxs_j = jnp.asarray(cys), jnp.asarray(cxs)
    valid_j = jnp.asarray(valid)
    hl_j = jnp.asarray(has_left)
    i32 = lambda a: a.astype(jnp.int32)
    (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr, tu_c,
     mode_c, zidx_c, bs_ver, bs_hor, inter4, mv, ref_slot, pred_fl,
     tu_inter_y, tu_inter_c, wp_w, sao_type, sao_offsets, sao_band,
     sao_eo) = map(
        i32, (coeff_y, tu_y, mode_y, zidx_y, qp_y, coeff_cb, coeff_cr,
              tu_c, mode_c, zidx_c, bs_ver, bs_hor, inter4, mv, ref_slot,
              pred_fl, tu_inter_y, tu_inter_c, wp_w, sao_type,
              sao_offsets, sao_band, sao_eo))
    lwd_y = luma_log2wd.astype(jnp.int32) + 6
    lwd_c = chroma_log2wd.astype(jnp.int32) + 6

    # ---- motion compensation (whole frame, both lists) ----
    mc_y0 = _mc_hevc_luma(refs_y, mv[0], ref_slot[0])
    mc_y1 = _mc_hevc_luma(refs_y, mv[1], ref_slot[1])
    pred_y = _cells_to_plane_j(
        _combine_pred(mc_y0, mc_y1, pred_fl[0], pred_fl[1],
                      wp_w[0, ..., 0], wp_w[0, ..., 1],
                      wp_w[1, ..., 0], wp_w[1, ..., 1], lwd_y))
    mc_cb0 = _mc_hevc_chroma(refs_cb, mv[0], ref_slot[0])
    mc_cb1 = _mc_hevc_chroma(refs_cb, mv[1], ref_slot[1])
    pred_cb = _cells_to_plane_j(
        _combine_pred(mc_cb0, mc_cb1, pred_fl[0], pred_fl[1],
                      wp_w[0, ..., 2], wp_w[0, ..., 3],
                      wp_w[1, ..., 2], wp_w[1, ..., 3], lwd_c))
    mc_cr0 = _mc_hevc_chroma(refs_cr, mv[0], ref_slot[0])
    mc_cr1 = _mc_hevc_chroma(refs_cr, mv[1], ref_slot[1])
    pred_cr = _cells_to_plane_j(
        _combine_pred(mc_cr0, mc_cr1, pred_fl[0], pred_fl[1],
                      wp_w[0, ..., 4], wp_w[0, ..., 5],
                      wp_w[1, ..., 4], wp_w[1, ..., 5], lwd_c))

    # ---- residuals ----
    resid_y = _residual_plane(coeff_y, qp_y, tu_y, True, (2, 3, 4, 5))
    resid_y_i = _residual_plane(coeff_y, qp_y, tu_inter_y, False,
                                (2, 3, 4, 5))
    qpc_cb = jnp.asarray(_QPC_T)[jnp.clip(qp_y[::2, ::2] + cb_qp_off, 0, 57)]
    qpc_cr = jnp.asarray(_QPC_T)[jnp.clip(qp_y[::2, ::2] + cr_qp_off, 0, 57)]
    resid_cb = _residual_plane(coeff_cb, qpc_cb, tu_c, False, (2, 3, 4))
    resid_cr = _residual_plane(coeff_cr, qpc_cr, tu_c, False, (2, 3, 4))
    # 4:2:0 chroma TUs are at most 16 (half the 32 luma max, 7.4.9.8)
    resid_cb_i = _residual_plane(coeff_cb, qpc_cb, tu_inter_c, False,
                                 (2, 3, 4))
    resid_cr_i = _residual_plane(coeff_cr, qpc_cr, tu_inter_c, False,
                                 (2, 3, 4))

    # ---- inter base = clip(MC + residual), masked to inter cells ----
    px_inter = jnp.repeat(jnp.repeat(inter4, 4, 0), 4, 1)
    base_y = jnp.where(px_inter != 0,
                       jnp.clip(pred_y + resid_y_i, 0, 255), 0)
    cx_inter = jnp.repeat(jnp.repeat(inter4[::2, ::2], 4, 0), 4, 1)[
        :Hp // 2, :Wp // 2]
    base_cb = jnp.where(cx_inter != 0,
                        jnp.clip(pred_cb + resid_cb_i, 0, 255), 0)
    base_cr = jnp.where(cx_inter != 0,
                        jnp.clip(pred_cr + resid_cr_i, 0, 255), 0)

    # inter cells carry their CU's z-scan index (plan.record_inter_cu_done)
    # so the zidx availability compare matches 6.4.1 exactly

    # ---- luma scan (intra TUs reconstruct over the inter base) ----
    t = lambda p, n: _skew(_plane_to_ctb_tiles(p, ctb_h, ctb_w, n),
                           cys_j, cxs_j)
    idx_y = (None if _use_pallas_walk(walk) else
             _skewed_idx_tiles(mode_y, ctb_h, ctb_w, C, 32, cys_j, cxs_j))
    Yt = _intra_scan(t(resid_y, C), t(zidx_y, C // 4), t(tu_y, C // 4),
                     t(mode_y, C // 4), valid_j, hl_j,
                     C, skew, 32, is_chroma=False, strong=strong,
                     base_t=t(base_y, C), idx_t=idx_y, walk=walk)
    Y = _unskew_to_plane(Yt, cys_j, cxs_j, valid_j, ctb_h, ctb_w, C)

    # ---- chroma scan ----
    Cc = C // 2
    cat2 = lambda a, b: jnp.concatenate([a, b], axis=1)
    rc = cat2(t(resid_cb, Cc), t(resid_cr, Cc))
    zc2 = cat2(t(zidx_c, Cc // 4), t(zidx_c, Cc // 4))
    tc2 = cat2(t(tu_c, Cc // 4), t(tu_c, Cc // 4))
    mc2 = cat2(t(mode_c, Cc // 4), t(mode_c, Cc // 4))
    v2 = cat2(valid_j, valid_j)
    h2 = cat2(hl_j, hl_j)
    bc2 = cat2(t(base_cb, Cc), t(base_cr, Cc))
    if _use_pallas_walk(walk):
        idx_c = None
    else:
        idx_c1 = _skewed_idx_tiles(mode_c, ctb_h, ctb_w, Cc, 16,
                                   cys_j, cxs_j)
        idx_c = {n: (cat2(ei, ei), cat2(oi, oi))
                 for n, (ei, oi) in idx_c1.items()}
    Ct = _intra_scan(rc, zc2, tc2, mc2, v2, h2,
                     Cc, skew, 16, is_chroma=True, strong=False, groups=2,
                     base_t=bc2, idx_t=idx_c, walk=walk)
    U = _unskew_to_plane(Ct[:, :ctb_h], cys_j, cxs_j, valid_j,
                         ctb_h, ctb_w, Cc)
    V = _unskew_to_plane(Ct[:, ctb_h:], cys_j, cxs_j, valid_j,
                         ctb_h, ctb_w, Cc)

    # ---- in-loop filters ----
    if deblock_on:
        Y, U, V = _deblock(Y, U, V, bs_ver, bs_hor, qp_y, beta_off, tc_off,
                           cb_qp_off, cr_qp_off)
    Y = _sao_plane(Y, sao_type[..., 0], sao_offsets[..., 0, :],
                   sao_band[..., 0], sao_eo[..., 0], log2_ctb, pw, ph)
    U = _sao_plane(U, sao_type[..., 1], sao_offsets[..., 1, :],
                   sao_band[..., 1], sao_eo[..., 1], log2_ctb - 1,
                   pw // 2, ph // 2)
    V = _sao_plane(V, sao_type[..., 2], sao_offsets[..., 2, :],
                   sao_band[..., 2], sao_eo[..., 2], log2_ctb - 1,
                   pw // 2, ph // 2)
    return (Y[:ph, :pw].astype(jnp.uint8),
            U[:ph // 2, :pw // 2].astype(jnp.uint8),
            V[:ph // 2, :pw // 2].astype(jnp.uint8))


def decode_plan_inter(plan, ref_stacks, coded: bool = False):
    """Inter HevcFramePlan + (refs_y [R,16,..], refs_cb, refs_cr) stacks ->
    (Y, U, V) uint8 device arrays (coded size when coded=True)."""
    if not plan.supported:
        raise NotImplementedError(f"plan unsupported: {plan.reason}")
    wide = _widen_i32(
        _jc(plan.coeff_y, np.int16), _jc(plan.tu_log2_y, np.int8),
        _jc(plan.mode_y, np.int8), _jc(plan.zidx_y, np.int32),
        _jc(plan.qp_y, np.int8),
        _jc(plan.coeff_cb, np.int16), _jc(plan.coeff_cr, np.int16),
        _jc(plan.tu_log2_c, np.int8),
        _jc(plan.mode_c, np.int8), _jc(plan.zidx_c, np.int32),
        _jc(plan.bs_ver, np.int8), _jc(plan.bs_hor, np.int8),
        _jc(plan.sao_type, np.int8), _jc(plan.sao_offsets, np.int8),
        _jc(plan.sao_band, np.int8), _jc(plan.sao_eo, np.int8),
        # mv is quarter-pel, gated |mv| <= 4*(MC_PAD_HEVC-8) << 2^15;
        # weights/offsets are 8-bit-range se(v) values (7.4.7.3)
        _jc(plan.inter4, np.int8), _jc(plan.mv, np.int16),
        _jc(plan.ref_slot, np.int8), _jc(plan.pred_fl, np.int8),
        _jc(plan.tu_log2_inter_y, np.int8),
        _jc(plan.tu_log2_inter_c, np.int8),
        _jc(plan.wp_w, np.int16))
    Y, U, V = decode_frame_hevc_inter(
        plan.Hp, plan.Wp, plan.log2_ctb, bool(plan.strong_smoothing),
        not plan.deblock_disabled, plan.pw, plan.ph,
        *wide[:10],
        jnp.int32(plan.cb_qp_off), jnp.int32(plan.cr_qp_off),
        jnp.int32(plan.beta_off), jnp.int32(plan.tc_off),
        *wide[10:],
        jnp.int32(plan.luma_log2wd), jnp.int32(plan.chroma_log2wd),
        *ref_stacks, walk=resolve_walk())
    if coded:
        return Y, U, V
    h, w = plan.height, plan.width
    return Y[:h, :w], U[:h // 2, :w // 2], V[:h // 2, :w // 2]
