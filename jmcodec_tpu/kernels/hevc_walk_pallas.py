"""Pallas TU-tree walk for the HEVC CTB wavefront (the r4 headline fix).

The XLA walk (hevc_tiles._make_walk) evaluates ~340 dependent TU candidates
per scan step, each one a separate dispatch that round-trips the ~27 MB F
composite through HBM (~205 us/candidate measured). This kernel walks ALL
candidates of a scan step inside ONE pallas_call with F resident in VMEM.

Layout: lane-LAST. The wavefront batch axis (CTB rows x frames) rides the
minor-most (128-lane) dimension, so
  * per-candidate vector ops engage the full VPU lane width even for 4x4
    TUs (the lane-first layout ran them at [8, 4, 4] = sub-vreg shapes);
  * per-lane mode-table selects become [K,35]x[35,BL] MXU matmuls;
  * every dynamic slice offset sits on an OUTER dim (rows) or is 8-aligned
    on the sublane dim (columns) — Mosaic requires sublane-dim dynamic
    offsets to be provably 8-aligned, so column windows load at
    align8(x0) and select between the two possible +0/+4 residues (TU x
    offsets are always multiples of 4).

The candidate loop is a fori_loop over an SMEM z-order table with four
predicated size-class bodies (pl.when), so kernel code size is O(sizes),
not O(candidates) — Mosaic compile time stays flat, and a whole-block skip
(pl.when(any(tu match))) drops inactive candidates.

Per-candidate math mirrors hevc_tiles._tu_candidate exactly (substitution,
[1 2 1]/strong filtering, 35-mode prediction, residual add, tu-masked
write) so bit-exactness vs the host reference decoder is preserved; the
conformance suite covers this path (DEFAULT on TPU since r5, selected
by hevc_tiles.resolve_walk as a static jit argument). Horizontal
angular modes are computed in a second window pass with the roles of y/x
swapped instead of transposing (Mosaic relayout-free).

Reference capability: the decode silicon behind intel_dec.cpp:722-741 /
nv_dec.cpp:394 (cuvidDecodePicture).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# static per-size tables (ride in as kernel inputs, TRANSPOSED: [K, 35] so
# per-lane selection is dot(T, onehot) on the MXU)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _walk_tables(n: int):
    """Per-mode tables for TU size n:
      PROJ [35, n]  v-index of ext positions 0..n-1 (invAngle projection),
                    -1 = no source (contributes 0)
      OFF  [35, n]  window start per prediction row (0..2n)
      FRAC [35, n]  per-row fractional weight
      ISHOR[35]     horizontal family
      FILT [35]     [1 2 1] smoothing applies (luma, n>=8)
    Derived from the validated one-hot tables in hevc_tiles; the main-ref
    part (ext positions n..3n) is regular (corner + left-or-top run) and is
    built directly in-kernel, so only the projection needs a table."""
    from .hevc_tiles import _filter_flags, _pred_idx_tables
    ext_idx, off_idx = _pred_idx_tables(n)
    L = 4 * n + 1
    # sanity: main part of ext is the regular corner + hor/ver run
    for m in range(2, 35):
        hor = m < 18
        assert ext_idx[m, n] == 2 * n, (n, m)
        for i in range(2 * n):
            want = (2 * n - 1 - i) if hor else (2 * n + 1 + i)
            assert ext_idx[m, n + 1 + i] == want, (n, m, i)
        assert ext_idx[m, 3 * n + 1] == L, (n, m)
    proj = ext_idx[:, :n].copy()
    proj[proj == L] = -1
    ishor = np.zeros(35, np.int32)
    ishor[2:18] = 1
    from .hevc_tiles import _pred_tables
    _, _, FRAC, _ = _pred_tables(n)
    filt = _filter_flags(n).astype(np.int32)
    return (proj.astype(np.int32), off_idx.astype(np.int32),
            FRAC.astype(np.int32), ishor, filt)


def _zorder_candidates(C: int, max_tu: int):
    from .hevc_tiles import _zorder_candidates as z
    return z(C, max_tu)


@functools.lru_cache(maxsize=8)
def _pack_tables(sizes):
    """One [3n+1, 35] int32 table per TU size (rows: proj | off | frac |
    filt), plus a shared [1, 35] ISHOR row. Transposed so the kernel's
    per-lane table select is dot(T[K,35], onehot[35, BL]) on the MXU."""
    tbls = []
    for n in sizes:
        proj, off, frac, ishor, filt = _walk_tables(n)
        tbls.append(np.concatenate(
            [proj.T, off.T, frac.T, filt[None, :]], axis=0).astype(np.int32))
    _, _, _, ishor, _ = _walk_tables(sizes[0])
    tbls.append(ishor[None, :].astype(np.int32))
    return tbls, sizes


def _cand_table(C: int, max_tu: int, sizes):
    """Z-order candidate table [(cls, x0, y0)] as an int32 array [NC, 3]."""
    cls_of = {n: i for i, n in enumerate(sizes)}
    rows = [(cls_of[n], x0, y0) for (n, x0, y0) in
            _zorder_candidates(C, max_tu)]
    return np.asarray(rows, np.int32)


# ---------------------------------------------------------------------------
# in-kernel helpers — lane-last: vectors are [K, BL], planes [Y, X, BL]
# ---------------------------------------------------------------------------


def _rev0(a, chunk=8):
    """Reverse along axis 0 via an anti-diagonal masked sum, chunked over
    output rows to bound the [rows, K, BL] temporary (robust under Mosaic:
    no sublane-dim reshapes). a [K, BL]."""
    K, BL = a.shape
    outs = []
    for j0 in range(0, K, chunk):
        cj = min(chunk, K - j0)
        ji = j0 + jax.lax.broadcasted_iota(jnp.int32, (cj, K, BL), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (cj, K, BL), 1)
        outs.append(jnp.sum(jnp.where(ji + ki == K - 1, a[None], 0), axis=1))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _rep4_0(a, chunk=16):
    """Repeat each row 4x along axis 0: [K, BL] -> [4K, BL] (masked sum,
    chunked over output rows)."""
    K, BL = a.shape
    outs = []
    for j0 in range(0, 4 * K, chunk):
        cj = min(chunk, 4 * K - j0)
        ji = j0 + jax.lax.broadcasted_iota(jnp.int32, (cj, K, BL), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (cj, K, BL), 1)
        outs.append(jnp.sum(jnp.where((ji >> 2) == ki, a[None], 0), axis=1))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _shift_r0(a, k, fill):
    """Shift axis 0 right by k (toward higher index), filling on top."""
    pad = jnp.full((k,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([pad, a[:-k]], axis=0)


def _shift_l0(a, k, fill):
    pad = jnp.full((k,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a[k:], pad], axis=0)


def _substitute0(v, am):
    """Reference-sample substitution (8.4.4.2.2): nearest-available fill
    via log-depth shift scans along axis 0. v [L, BL] int32, am [L, BL]
    int32 0/1."""
    L = v.shape[0]
    val = jnp.where(am != 0, v, 0)
    have = am
    sh = 1
    while sh < L:
        val = jnp.where(have != 0, val, _shift_r0(val, sh, 0))
        have = have | _shift_r0(have, sh, 0)
        sh *= 2
    fwd_v, fwd_f = val, have
    val = jnp.where(am != 0, v, 0)
    have = am
    sh = 1
    while sh < L:
        val = jnp.where(have != 0, val, _shift_l0(val, sh, 0))
        have = have | _shift_l0(have, sh, 0)
        sh *= 2
    out = jnp.where(fwd_f != 0, fwd_v, val)
    any_av = jnp.max(am, axis=0, keepdims=True)
    return jnp.where(any_av != 0, out, 128)


def _filter_121_0(v):
    """[1 2 1] smoothing with endpoints kept (8.4.4.2.3). v [L, BL]."""
    up = jnp.concatenate([v[:1], v[:-1]], axis=0)
    dn = jnp.concatenate([v[1:], v[-1:]], axis=0)
    sm = (up + 2 * v + dn + 2) >> 2
    L = v.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where((j == 0) | (j == L - 1), v, sm)


def _strong_filter0(v, n):
    """Strong bilinear smoothing for n==32 (8.4.4.2.3). v [L, BL]; returns
    (strong [L, BL], cond [1, BL])."""
    tl = v[2 * n:2 * n + 1]
    bl = v[0:1]
    tr = v[4 * n:4 * n + 1]
    t_mid = v[2 * n + 1 + n - 1:2 * n + 1 + n]
    l_mid = v[n:n + 1]
    thr = 1 << 3
    cond = ((jnp.abs(tl + tr - 2 * t_mid) < thr) &
            (jnp.abs(tl + bl - 2 * l_mid) < thr))
    BL = v.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (2 * n, BL), 0)
    nl_down = ((2 * n - 1 - k) * tl + (k + 1) * bl + 32) >> 6
    nl_down = jnp.where(k == 2 * n - 1, bl, nl_down)
    nt = ((2 * n - 1 - k) * tl + (k + 1) * tr + 32) >> 6
    nt = jnp.where(k == 2 * n - 1, tr, nt)
    strong = jnp.concatenate([_rev0(nl_down), tl, nt], axis=0)
    return strong, jnp.where(cond, 1, 0)


def _tsel0(Tt, ohf):
    """Per-lane table-row select on the MXU: Tt [K, 35] int32 (values fit
    f32 exactly), ohf [35, BL] f32 one-hot -> [K, BL] int32."""
    r = jnp.dot(Tt.astype(jnp.float32), ohf,
                preferred_element_type=jnp.float32)
    return r.astype(jnp.int32)


def _gather0(v, idx, chunk=4):
    """Per-lane gather along axis 0: out[k, l] = v[idx[k, l], l], 0 where
    idx < 0 or >= L. v [L, BL], idx [K, BL] -> [K, BL]."""
    L, BL = v.shape
    K = idx.shape[0]
    outs = []
    for k0 in range(0, K, chunk):
        ck = min(chunk, K - k0)
        idc = idx[k0:k0 + ck][:, None, :]                    # [ck, 1, BL]
        sid = jax.lax.broadcasted_iota(jnp.int32, (ck, L, BL), 1)
        m = idc == sid
        outs.append(jnp.sum(jnp.where(m, v[None], 0), axis=1))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _win_rows(ext, sh, n, chunk=8):
    """seg[m, p, l] = ext[sh[m, l] + p] for p in 0..n: per-row variable
    shift along axis 1, in log2(max shift) select+shift passes (chunked
    over rows to bound the [rows, S, BL] broadcast temporary in VMEM).
    ext [S, BL], sh [n, BL] (values 1..2n+1) -> [n, n+1, BL]."""
    S, BL = ext.shape
    maxsh = 2 * n + 1
    outs = []
    for m0 in range(0, n, chunk):
        cm = min(chunk, n - m0)
        T = jnp.broadcast_to(ext[None], (cm, S, BL))
        shc = sh[m0:m0 + cm]
        b = 1
        while b <= maxsh:
            shifted = jnp.concatenate(
                [T[:, b:, :], jnp.zeros((cm, b, BL), T.dtype)], axis=1)
            T = jnp.where(
                ((shc >> (b.bit_length() - 1)) & 1)[:, None, :] != 0,
                shifted, T)
            b *= 2
        outs.append(T[:, :n + 1, :])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _win_cols(ext, sh, n, chunk=8):
    """T2[p, m, l] = ext[p + sh[m, l]] for p in 0..n: the transposed-roles
    variant for horizontal modes (shift along axis 0, per-column amounts),
    chunked over columns. ext [S, BL], sh [n, BL] -> [n+1, n, BL]."""
    S, BL = ext.shape
    maxsh = 2 * n + 1
    outs = []
    for m0 in range(0, n, chunk):
        cm = min(chunk, n - m0)
        T = jnp.broadcast_to(ext[:, None, :], (S, cm, BL))
        shc = sh[m0:m0 + cm]
        b = 1
        while b <= maxsh:
            shifted = jnp.concatenate(
                [T[b:], jnp.zeros((b, cm, BL), T.dtype)], axis=0)
            T = jnp.where(((shc >> (b.bit_length() - 1)) & 1)[None] != 0,
                          shifted, T)
            b *= 2
        outs.append(T[:n + 1])
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _col0(row, c):
    """row [K, BL], dynamic column index c (axis-0 position) -> [1, BL]."""
    K, BL = row.shape
    ci = jax.lax.broadcasted_iota(jnp.int32, (K, BL), 0)
    return jnp.sum(jnp.where(ci == c, row, 0), axis=0, keepdims=True)


def _win0(row, c, K_out):
    """out[k, l] = row[c + k, l] for k in 0..K_out-1 (masked sum).
    row [K, BL], dynamic scalar c."""
    K, BL = row.shape
    ki = jax.lax.broadcasted_iota(jnp.int32, (K_out, K, BL), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (K_out, K, BL), 1)
    return jnp.sum(jnp.where(si == ki + c, row[None], 0), axis=1)


# Sublane-dim dynamic offsets must be provably aligned; ALIGN covers the
# int16 F composite (8 was accepted by Mosaic for i16 loads).
ALIGN = int(os.environ.get("JMX_PALLAS_ALIGN", "8"))


def _alignedA(x):
    return pl.multiple_of((x // ALIGN) * ALIGN, ALIGN)


def _xload(ref, y0, ny, x0, c, nx):
    """ref[y0:y0+ny, x0+c : x0+c+nx, :] as int32, where x0 is a dynamic
    multiple of 4 and c is a static 0/1: loads at alignA(x0) and selects
    among the possible residues (all multiples of 4)."""
    xb = _alignedA(x0)
    win = ref[pl.ds(y0, ny), pl.ds(xb, nx + ALIGN), :].astype(jnp.int32)
    out = win[:, c:c + nx, :]
    for r in range(4, ALIGN, 4):
        out = jnp.where(x0 - xb == r, win[:, r + c:r + c + nx, :], out)
    return out


def _xstore(ref, y0, ny, x0, c, nx, val, active):
    """Masked read-modify-write of ref[y0:y0+ny, x0+c : x0+c+nx, :] = val
    where active (active [1, 1, BL]); x0 dynamic multiple of 4, c static
    0/1."""
    xb = _alignedA(x0)
    win = ref[pl.ds(y0, ny), pl.ds(xb, nx + ALIGN), :]
    res = x0 - xb
    placed = jnp.pad(val, ((0, 0), (c, ALIGN - c), (0, 0)))
    for r in range(4, ALIGN, 4):
        placed = jnp.where(
            res == r,
            jnp.pad(val, ((0, 0), (r + c, ALIGN - r - c), (0, 0))), placed)
    start = res + c
    ci = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    mask = (ci >= start) & (ci < start + nx) & (active != 0)
    ref[pl.ds(y0, ny), pl.ds(xb, nx + ALIGN), :] = jnp.where(
        mask, placed.astype(ref.dtype), win)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _candidate_body(Fo, Z, R, Tc, Mc, TB, ISHOR, n, x0, y0, C,
                    is_chroma, strong):
    """Evaluate one TU candidate of size n at dynamic (x0, y0) — both
    multiples of 4 — updating the [HF, WF, BL] VMEM block Fo in place.
    Fo/Z/R/Tc/Mc are VMEM refs. Mirrors hevc_tiles._tu_candidate."""
    BL = Fo.shape[-1]
    cx0, cy0 = x0 // 4, y0 // 4
    log2 = n.bit_length() - 1
    n4 = n // 4
    PROJt = TB[0:n]                       # [n, 35]
    OFFt = TB[n:2 * n]
    FRACt = TB[2 * n:3 * n]
    FILTt = TB[3 * n:3 * n + 1]

    d = pl.ds
    trow_t = Tc[d(cy0, 1), :, :][0]                           # [C4, BL]
    tu_here = _col0(trow_t, cx0)                              # [1, BL]
    active = jnp.where(tu_here == log2, 1, 0)

    @pl.when(jnp.max(active) > 0)
    def _():
        # ---- reference samples + availability ----
        zrows = Z[d(1 + cy0, 2 * n4), :, :]                   # [2n4, WZ, BL]
        ztop = Z[d(cy0, 1), :, :][0]                          # [WZ, BL]
        z_org = _col0(zrows[0], 1 + cx0)
        zl = jnp.sum(jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, zrows.shape, 1) == cx0, zrows, 0), axis=1)
        zt = _win0(ztop, 1 + cx0, 2 * n4)
        zc = _col0(ztop, cx0)
        a_l = _rep4_0(_rev0(jnp.where(zl < z_org, 1, 0)))
        a_t = _rep4_0(jnp.where(zt < z_org, 1, 0))
        a_c = jnp.where(zc < z_org, 1, 0)
        amask = jnp.concatenate([a_l, a_c, a_t], axis=0)      # [L, BL]

        lwin = _xload(Fo, y0 + 1, 2 * n, x0, 0, 1)            # [2n, 1, BL]
        lcol = jnp.sum(lwin, axis=1)
        toprow = _xload(Fo, y0, 1, x0, 0, 2 * n + 1)[0]       # [2n+1, BL]
        corner = toprow[0:1]
        trow = toprow[1:]
        v = jnp.concatenate([_rev0(lcol), corner, trow], axis=0)

        vs = _substitute0(v, amask)
        mrow = Mc[d(cy0, 1), :, :][0]
        mode = _col0(mrow, cx0)                               # [1, BL]
        mids = jax.lax.broadcasted_iota(jnp.int32, (35, BL), 0)
        ohf = (mids == mode).astype(jnp.float32)              # [35, BL]

        if not is_chroma and n > 4:
            v121 = _filter_121_0(vs)
            if n == 32 and strong:
                vstr, cond = _strong_filter0(vs, n)
                v121 = jnp.where(cond != 0, vstr, v121)
            fsel = _tsel0(FILTt, ohf)                         # [1, BL]
            vf = jnp.where(fsel != 0, v121, vs)
        else:
            vf = vs

        left_f = _rev0(vf[:2 * n])            # vf left[0..2n-1] downward
        left_s = left_f if vf is vs else _rev0(vs[:2 * n])

        # ---- angular prediction (dual orientation, no transpose) ----
        ishor = _tsel0(ISHOR, ohf)                            # [1, BL]
        main = jnp.where(ishor != 0, left_f, vf[2 * n + 1:])  # [2n, BL]
        proj = _gather0(vf, _tsel0(PROJt, ohf))               # [n, BL]
        ext = jnp.concatenate(
            [proj, vf[2 * n:2 * n + 1], main,
             jnp.zeros((1, BL), jnp.int32)], axis=0)          # [3n+2, BL]
        off = _tsel0(OFFt, ohf)                               # [n, BL]
        frac = _tsel0(FRACt, ohf)                             # [n, BL]
        sh = 1 + off
        segv = _win_rows(ext, sh, n)                          # [n, n+1, BL]
        f3 = frac[:, None, :]
        angv = ((32 - f3) * segv[:, :n, :] + f3 * segv[:, 1:, :] + 16) >> 5
        segh = _win_cols(ext, sh, n)                          # [n+1, n, BL]
        fx = frac[None]                                       # [1, n, BL]
        angh = ((32 - fx) * segh[:n] + fx * segh[1:] + 16) >> 5
        ish3 = ishor[:, None, :]                              # [1, 1, BL]
        ang = jnp.where(ish3 != 0, angh, angv)

        # ---- planar (mode 0), on the filtered refs ----
        ys = jax.lax.broadcasted_iota(jnp.int32, (n, n, BL), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (n, n, BL), 1)
        left = left_f[:n + 1]                                 # [n+1, BL]
        top = vf[2 * n + 1:3 * n + 2]                         # [n+1, BL]
        left_y = left[:n][:, None, :]
        top_x = top[:n][None, :, :]
        top_n = top[n:n + 1][None]                            # [1, 1, BL]
        left_n = left[n:n + 1][None]
        log2 = n.bit_length() - 1
        planar = ((n - 1 - xs) * left_y + (xs + 1) * top_n
                  + (n - 1 - ys) * top_x + (ys + 1) * left_n
                  + n) >> (log2 + 1)

        # ---- DC (mode 1), unfiltered refs ----
        dc1 = (jnp.sum(vs[n:2 * n], axis=0, keepdims=True)
               + jnp.sum(vs[2 * n + 1:3 * n + 1], axis=0, keepdims=True)
               + n) >> (log2 + 1)                             # [1, BL]
        dcp = jnp.broadcast_to(dc1[None], (n, n, BL))
        if not is_chroma and n < 32:
            t_row = vs[2 * n + 1:3 * n + 1]                   # [n, BL]
            l_col = left_s[:n]
            edge_t = (t_row + 3 * dc1 + 2) >> 2
            edge_l = (l_col + 3 * dc1 + 2) >> 2
            cornr = (l_col[0:1] + 2 * dc1 + t_row[0:1] + 2) >> 2
            dcp = jnp.where(ys == 0, edge_t[None], dcp)
            dcp = jnp.where(xs == 0, edge_l[:, None, :], dcp)
            dcp = jnp.where((ys == 0) & (xs == 0), cornr[None], dcp)

        mode3 = mode[:, None, :]                              # [1, 1, BL]
        out = jnp.where(mode3 == 0, planar,
                        jnp.where(mode3 == 1, dcp, ang))

        # pure vertical/horizontal edge filters (luma, n<32)
        if not is_chroma and n < 32:
            t_row = vs[2 * n + 1:3 * n + 1]
            l_col = left_s[:n]
            tl = vs[2 * n:2 * n + 1]
            ver_col = jnp.clip(((l_col - tl) >> 1) + t_row[0:1], 0, 255)
            hor_row = jnp.clip(((t_row - tl) >> 1) + l_col[0:1], 0, 255)
            out = jnp.where((mode3 == 26) & (xs == 0),
                            ver_col[:, None, :], out)
            out = jnp.where((mode3 == 10) & (ys == 0),
                            hor_row[None], out)

        rblk = _xload(R, y0, n, x0, 0, n)
        rec = jnp.clip(out + rblk, 0, 255)
        _xstore(Fo, y0 + 1, n, x0, 1, n, rec, active[:, None, :])


def _make_kernel(C, max_tu, is_chroma, strong):
    sizes = tuple(sorted({n for (n, _, _) in
                          _zorder_candidates(C, max_tu)}, reverse=True))
    NC = len(_zorder_candidates(C, max_tu))

    def kernel(tbl_ref, F_ref, Z_ref, R_ref, T_ref, M_ref, *rest):
        tb_refs = rest[:len(sizes) + 1]
        out_ref = rest[len(sizes) + 1]
        sem = rest[len(sizes) + 2]
        # F stays in HBM (ANY): DMA this grid block's lanes straight into
        # the output VMEM block — saves a whole F-sized VMEM input block
        # (the kernel walks in place on out_ref)
        i = pl.program_id(0)
        BL = out_ref.shape[-1]
        dma = pltpu.make_async_copy(
            F_ref.at[:, :, pl.ds(i * BL, BL)], out_ref, sem)
        dma.start()
        dma.wait()
        tbs = [tb_refs[i][...] for i in range(len(sizes))]
        ishor = tb_refs[len(sizes)][...]

        def body(i, carry):
            cls = tbl_ref[i, 0]
            x0 = tbl_ref[i, 1]
            y0 = tbl_ref[i, 2]
            for k, n in enumerate(sizes):
                @pl.when(cls == k)
                def _(n=n, k=k):
                    _candidate_body(out_ref, Z_ref, R_ref, T_ref, M_ref,
                                    tbs[k], ishor, n, x0, y0, C,
                                    is_chroma, strong)
            return carry

        jax.lax.fori_loop(0, NC, body, 0)
    return kernel, sizes


@functools.lru_cache(maxsize=64)
def _walk_call(C, max_tu, is_chroma, strong, B, HF, WF, HZ, WZ,
               lane_block, interpret):
    kernel, sizes = _make_kernel(C, max_tu, is_chroma, strong)
    tbls_np, _ = _pack_tables(sizes)
    tbl_np = _cand_table(C, max_tu, sizes)
    C4 = C // 4
    grid = (B // lane_block,)
    bs = lambda shape: pl.BlockSpec(
        shape + (lane_block,), lambda i: (0,) * len(shape) + (i,),
        memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    mode_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for t in tbls_np]

    vmem_mb = int(os.environ.get("JMX_PALLAS_VMEM_MB", "15"))
    params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def run(F, Z, resid, tu, mode):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tbl_spec, f_spec, bs((HZ, WZ)), bs((C, C + ALIGN)),
                      bs((C4, C4)), bs((C4, C4))] + mode_specs,
            out_specs=bs((HF, WF)),
            out_shape=jax.ShapeDtypeStruct((HF, WF, B), jnp.int16),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=params,
            interpret=bool(interpret),
        )(jnp.asarray(tbl_np), F, Z, resid, tu, mode,
          *[jnp.asarray(t) for t in tbls_np])
    return run


def _pick_lane_block(B, interpret):
    """TPU lane blocks must be multiples of 128 (DMA lane-dim tiling);
    interpret mode (CPU tests) keeps blocks small for speed."""
    if interpret:
        return min(128, max(8, _cdiv(B, 8) * 8))
    cap = max(128, int(os.environ.get("JMX_PALLAS_BL", "128")) // 128 * 128)
    return cap


def make_pallas_walk(C: int, max_tu: int, is_chroma: bool, strong: bool):
    """Drop-in replacement for hevc_tiles._make_walk(...): returns
    walk(F, Z, resid, tu_t, mode_t, idx=None) -> F (lane-first [B, H, W]
    in/out; transposed to lane-last around the kernel). The idx planes are
    ignored (mode tables are static kernel constants)."""

    def walk(F, Z, resid, tu_t, mode_t, idx=None):
        B, HF, WF = F.shape
        HZ, WZ = Z.shape[1], Z.shape[2]
        interpret = jax.default_backend() != "tpu"
        lb = _pick_lane_block(B, interpret)
        pad = (-B) % lb
        if pad:
            zpad = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            F, Z, resid, tu_t, mode_t = map(
                zpad, (F, Z, resid, tu_t, mode_t))
        tl = lambda a: jnp.transpose(a, (1, 2, 0))
        # F rides VMEM as int16 (lossless: pixel composites are 0..255);
        # the kernel upcasts to int32 at every load. Its W axis pads to a
        # multiple of 8 so the HBM->VMEM lane-block DMA slice is
        # tile-aligned in the sublane dim.
        WFp = -(-WF // 8) * 8
        Ft = tl(jnp.pad(F, ((0, 0), (0, 0), (0, WFp - WF)))
                ).astype(jnp.int16)
        Zi = tl(Z.astype(jnp.int32))
        # +ALIGN columns so aligned residual window loads stay in bounds.
        # Residuals ride VMEM as int16: the spec's inverse-transform output
        # is 16-bit clipped, and even for out-of-range values saturation is
        # invisible through the final clip(pred + resid, 0, 255) since
        # pred is 0..255 and |resid| >= 256 already saturates the output.
        Ri = tl(jnp.pad(jnp.clip(resid, -32768, 32767).astype(jnp.int16),
                        ((0, 0), (0, 0), (0, ALIGN))))
        Ti = tl(tu_t.astype(jnp.int32))
        Mi = tl(mode_t.astype(jnp.int32))
        run = _walk_call(C, max_tu, is_chroma, strong, B + pad, HF, WFp,
                         HZ, WZ, lb, interpret)
        out = run(Ft, Zi, Ri, Ti, Mi)
        out = jnp.transpose(out, (2, 0, 1)).astype(F.dtype)[:, :, :WF]
        return out[:B] if pad else out
    return walk
