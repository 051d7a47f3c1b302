"""Pallas TU-tree walk for the HEVC CTB wavefront (the r4 headline fix).

The XLA walk (hevc_tiles._make_walk) evaluates ~340 dependent TU candidates
per scan step, each one a separate dispatch that round-trips the ~27 MB F
composite through HBM (~205 us/candidate measured; the switch/fori_loop
variant measured 2.2x slower still). This kernel walks ALL candidates of a
scan step inside one pallas_call with F resident in VMEM:

  grid      = lane blocks (the batch axis: CTB rows x frames)
  aliasing  = F is input 0 and the output (in-place in HBM)
  state     = the per-block F tile lives in VMEM for the whole walk
  tables    = per-mode index/fraction tables are static kernel constants
              (no per-frame preselected index planes, no extra H2D)

Per-candidate math mirrors hevc_tiles._tu_candidate exactly (substitution,
[1 2 1]/strong filtering, 35-mode prediction, residual add, tu-masked
write) so bit-exactness vs the host reference decoder is preserved; the
conformance suite runs this path under JMX_HEVC_WALK=pallas.

Reference capability: the decode silicon behind intel_dec.cpp:722-741 /
nv_dec.cpp:394 (cuvidDecodePicture).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codec.hevc import intra as HIP


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# static per-size tables (kernel constants)
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
    """Pallas kernels may not capture array constants, so the per-mode
    tables ride in as inputs: one [35, 3n+1] table per TU size
    (proj | off | frac | filt columns) plus a shared [35, 1] ISHOR column.
    Kept as SEPARATE inputs (not one concatenated table): Mosaic cannot
    reshape lane-offset slices, so each table must load at lane offset 0.
    Returns (list of np arrays, sizes)."""
    tbls = []
    for n in sizes:
        proj, off, frac, ishor, filt = _walk_tables(n)
        tbls.append(np.concatenate(
            [proj, off, frac, filt[:, None]], axis=1).astype(np.int32))
    _, _, _, ishor, _ = _walk_tables(sizes[0])
    tbls.append(ishor[:, None].astype(np.int32))
    return tbls, sizes


# ---------------------------------------------------------------------------
# in-kernel helpers (all arrays lane-first: [LB, ...])
# ---------------------------------------------------------------------------


def _rev(a):
    """Reverse along the last axis via a static anti-diagonal masked sum
    (Mosaic has no lowering for lax.rev). a [LB, K] int32."""
    LB, K = a.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (LB, K, K), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (LB, K, K), 2)
    m = (j + c) == K - 1
    return jnp.sum(jnp.where(m, a[:, None, :], 0), axis=-1)


def _shift_r(a, k, fill):
    """Shift last axis right by k (toward higher index), filling with
    `fill` on the left."""
    pad = jnp.full(a.shape[:-1] + (k,), fill, a.dtype)
    return jnp.concatenate([pad, a[..., :-k]], axis=-1)


def _shift_l(a, k, fill):
    pad = jnp.full(a.shape[:-1] + (k,), fill, a.dtype)
    return jnp.concatenate([a[..., k:], pad], axis=-1)


def _substitute(v, am):
    """Reference-sample substitution (8.4.4.2.2): nearest-available fill
    via log-depth shift scans. v [LB, L] int32, am [LB, L] int32 0/1
    (all-int32: Mosaic cannot reshape/expand i1 vectors)."""
    L = v.shape[-1]
    val = jnp.where(am != 0, v, 0)
    have = am
    sh = 1
    while sh < L:
        val = jnp.where(have != 0, val, _shift_r(val, sh, 0))
        have = have | _shift_r(have, sh, 0)
        sh *= 2
    fwd_v, fwd_f = val, have
    val = jnp.where(am != 0, v, 0)
    have = am
    sh = 1
    while sh < L:
        val = jnp.where(have != 0, val, _shift_l(val, sh, 0))
        have = have | _shift_l(have, sh, 0)
        sh *= 2
    out = jnp.where(fwd_f != 0, fwd_v, val)
    any_av = jnp.max(am, axis=-1, keepdims=True)
    return jnp.where(any_av != 0, out, 128)


def _filter_121(v):
    """[1 2 1] smoothing with endpoints kept (8.4.4.2.3)."""
    left = jnp.concatenate([v[:, :1], v[:, :-1]], axis=-1)
    right = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=-1)
    sm = (left + 2 * v + right + 2) >> 2
    LB, L = v.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (LB, L), 1)
    return jnp.where((j == 0) | (j == L - 1), v, sm)


def _strong_filter(v, n):
    """Strong bilinear smoothing for n==32 (8.4.4.2.3). Returns the
    strong-filtered vector and the per-lane condition."""
    tl = v[:, 2 * n]
    bl = v[:, 0]
    tr = v[:, 4 * n]
    t_mid = v[:, 2 * n + 1 + n - 1]
    l_mid = v[:, 2 * n - 1 - (n - 1)]
    thr = 1 << 3
    cond = (jnp.abs(tl + tr - 2 * t_mid) < thr) & \
           (jnp.abs(tl + bl - 2 * l_mid) < thr)
    LB = v.shape[0]
    k = jax.lax.broadcasted_iota(jnp.int32, (LB, 2 * n), 1)
    nl_down = ((2 * n - 1 - k) * tl[:, None] + (k + 1) * bl[:, None]
               + 32) >> 6
    nl_down = jnp.where(k == 2 * n - 1, bl[:, None], nl_down)
    nt = ((2 * n - 1 - k) * tl[:, None] + (k + 1) * tr[:, None] + 32) >> 6
    nt = jnp.where(k == 2 * n - 1, tr[:, None], nt)
    strong = jnp.concatenate([_rev(nl_down), tl[:, None], nt], axis=-1)
    return strong, jnp.where(cond, 1, 0)


def _b3(x1, n):
    """Per-lane scalar [LB, 1] -> [LB, n, 1] (Mosaic cannot broadcast into
    sublanes and lanes at once, nor lower 1D->2D reshapes of computed
    vectors — callers keep values 2D throughout)."""
    LB = x1.shape[0]
    return (x1 + jnp.zeros((LB, n), jnp.int32))[:, :, None]


def _tsel(oh, t):
    """Per-lane row select from a [35, K] table via the mode one-hot
    mask oh [LB, 35] int32 (masked sum; 35*K is small)."""
    return jnp.sum(oh[:, :, None] * t[None], axis=1)


def _gather_lanes(v, idx, chunk=16):
    """Per-lane gather: out[l, k] = v[l, idx[l, k]] (0 where idx < 0 or
    idx >= L). v [LB, L], idx [LB, K] -> [LB, K]."""
    LB, L = v.shape
    K = idx.shape[-1]
    outs = []
    for k0 in range(0, K, chunk):
        ck = min(chunk, K - k0)
        idc = idx[:, k0:k0 + ck]
        rid = jax.lax.broadcasted_iota(jnp.int32, (LB, ck, L), 2)
        m = idc[:, :, None] == rid
        outs.append(jnp.sum(jnp.where(m, v[:, None, :], 0), axis=-1))
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def _gather_rows(v, idx, chunk=4):
    """out[l, y, x] = v[l, idx[l, y] + x] for x in 0..X-1 (0 out of range).
    v [LB, S], idx [LB, Y] -> [LB, Y, X]. The minor-dim expansion happens
    BEFORE chunk slicing (Mosaic cannot reshape lane-offset slices)."""
    LB, S = v.shape
    Y = idx.shape[-1]
    idn = idx[:, :, None]                    # [LB, Y, 1]

    def one(y0, cy, X):
        idc = idn[:, y0:y0 + cy, :] + jax.lax.broadcasted_iota(
            jnp.int32, (LB, cy, X), 2)
        sid = jax.lax.broadcasted_iota(jnp.int32, (LB, cy, X, S), 3)
        m = idc[..., None] == sid
        return jnp.sum(jnp.where(m, v[:, None, None, :], 0), axis=-1)
    return one, Y


def _rep4(a):
    """Repeat each element 4x along the last axis: [LB, K] -> [LB, 4K]."""
    LB, K = a.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (LB, K, 4 * K), 2)
    src = jax.lax.broadcasted_iota(jnp.int32, (LB, K, 4 * K), 1)
    m = (j >> 2) == src
    return jnp.sum(jnp.where(m, a[:, :, None], 0), axis=1)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _candidate(Fo, Zr, Rr, Tr, Mr, TB, ISHOR, n, x0, y0, C, is_chroma,
               strong):
    """Evaluate one TU candidate at static (x0, y0), updating Fo in VMEM.
    Mirrors hevc_tiles._tu_candidate. TB is this size's [35, 3n+1] table
    (proj | off | frac | filt)."""
    LB = Fo.shape[0]
    n4 = n // 4
    cx0, cy0 = x0 >> 2, y0 >> 2
    log2 = n.bit_length() - 1
    L = 4 * n + 1
    PROJ = TB[:, 0:n]
    OFF = TB[:, n:2 * n]
    FRAC = TB[:, 2 * n:3 * n]
    FILT = TB[:, 3 * n:3 * n + 1]

    tu_here = Tr[:, cy0, cx0]
    active = tu_here == log2

    @pl.when(jnp.any(active))
    def _():
        z_org = Zr[:, 1 + cy0, 1 + cx0]
        lcol = Fo[:, y0 + 1:y0 + 1 + 2 * n, x0].astype(jnp.int32)
        corner = Fo[:, y0, x0].astype(jnp.int32)
        trow = Fo[:, y0, x0 + 1:x0 + 1 + 2 * n].astype(jnp.int32)
        v = jnp.concatenate([_rev(lcol), corner[:, None], trow], axis=-1)

        zl = Zr[:, 1 + cy0:1 + cy0 + 2 * n4, cx0]
        zt = Zr[:, cy0, 1 + cx0:1 + cx0 + 2 * n4]
        zc = Zr[:, cy0, cx0]
        a_l = _rep4(_rev(jnp.where(zl < z_org[:, None], 1, 0)))
        a_t = _rep4(jnp.where(zt < z_org[:, None], 1, 0))
        a_c = jnp.where(zc < z_org, 1, 0)[:, None]
        amask = jnp.concatenate([a_l, a_c, a_t], axis=-1)

        vs = _substitute(v, amask)
        mode = Mr[:, cy0, cx0]
        mids = jax.lax.broadcasted_iota(jnp.int32, (LB, 35), 1)
        oh = jnp.where(mode[:, None] == mids, 1, 0)
        mode_n = _b3(mode[:, None], n)      # [LB, n, 1] int32

        if not is_chroma and n > 4:
            v121 = _filter_121(vs)
            if n == 32 and strong:
                vstr, cond = _strong_filter(vs, n)
                v121 = jnp.where(cond[:, None] != 0, vstr, v121)
            fsel = _tsel(oh, FILT)
            vf = jnp.where(fsel != 0, v121, vs)
        else:
            vf = vs

        # left-edge (downward) views: one reversal each of the filtered and
        # unfiltered vectors, reused by main/planar and DC/edge paths
        left_f = _rev(vf[:, :2 * n])             # vf left[0..2n-1] downward
        left_s = left_f if vf is vs else _rev(vs[:, :2 * n])

        # ---- angular prediction ----
        ishor = _tsel(oh, ISHOR)                 # [LB, 1] int32
        main = jnp.where(ishor != 0, left_f, vf[:, 2 * n + 1:])
        proj = _gather_lanes(vf, _tsel(oh, PROJ))
        zcol = jnp.zeros((LB, 1), jnp.int32)
        # ext layout: [proj(n) | corner | main(2n) | none]
        ext = jnp.concatenate(
            [proj, vf[:, 2 * n][:, None], main, zcol], axis=-1)
        off = _tsel(oh, OFF)                     # [LB, n], window starts
        frac = _tsel(oh, FRAC)                   # [LB, n]
        one, _Y = _gather_rows(ext, 1 + off)
        segs = []
        ychunk = 4 if n >= 8 else n
        for yy0 in range(0, n, ychunk):
            segs.append(one(yy0, min(ychunk, n - yy0), n + 1))
        seg = jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]
        f = frac[..., None]
        ang = ((32 - f) * seg[:, :, :n] + f * seg[:, :, 1:] + 16) >> 5
        ish_n = _b3(ishor, n)                    # [LB, n, 1] int32
        ang = jnp.where(ish_n != 0, jnp.swapaxes(ang, -1, -2), ang)

        # ---- planar (mode 0) ----
        xs = jax.lax.broadcasted_iota(jnp.int32, (LB, n), 1)
        left = left_f[:, :n + 1]                 # left[0..n] downward
        top = vf[:, 2 * n + 1:][:, :n + 1]
        left_n = left[:, :n][:, :, None]         # [LB, n, 1]
        top_n = top[:, :n][:, None, :]           # [LB, 1, n]
        planar = ((n - 1 - xs)[:, None, :] * left_n
                  + (xs + 1)[:, None, :] * _b3(top[:, n:n + 1], n)
                  + (n - 1 - xs)[:, :, None] * top_n
                  + (xs + 1)[:, :, None] * _b3(left[:, n:n + 1], n)
                  + n) >> (log2 + 1)

        # ---- DC (mode 1), unfiltered refs ----
        dc1 = (jnp.sum(vs[:, n:2 * n], axis=-1, keepdims=True)
               + jnp.sum(vs[:, 2 * n + 1:3 * n + 1], axis=-1,
                         keepdims=True)
               + n) >> (log2 + 1)             # [LB, 1]
        dcp = _b3(dc1, n) + jnp.zeros((LB, n, n), jnp.int32)
        rid = jax.lax.broadcasted_iota(jnp.int32, (LB, n, n), 1)
        cid = jax.lax.broadcasted_iota(jnp.int32, (LB, n, n), 2)
        if not is_chroma and n < 32:
            t_row = vs[:, 2 * n + 1:3 * n + 1]
            l_col = left_s[:, :n]
            edge_t = (t_row + 3 * dc1 + 2) >> 2
            edge_l = (l_col + 3 * dc1 + 2) >> 2
            cornr = (l_col[:, 0:1] + 2 * dc1 + t_row[:, 0:1] + 2) >> 2
            dcp = jnp.where(rid == 0, edge_t[:, None, :], dcp)
            dcp = jnp.where(cid == 0, edge_l[:, :, None], dcp)
            dcp = jnp.where((rid == 0) & (cid == 0), _b3(cornr, n), dcp)

        out = jnp.where(mode_n == 0, planar,
                        jnp.where(mode_n == 1, dcp, ang))

        # pure vertical/horizontal edge filters (luma, n<32)
        if not is_chroma and n < 32:
            t_row = vs[:, 2 * n + 1:3 * n + 1]
            l_col = left_s[:, :n]
            tl = vs[:, 2 * n]
            ver_col = jnp.clip(((l_col - tl[:, None]) >> 1) + t_row[:, 0:1],
                               0, 255)
            hor_row = jnp.clip(((t_row - tl[:, None]) >> 1) + l_col[:, 0:1],
                               0, 255)
            out = jnp.where((mode_n == 26) & (cid == 0),
                            ver_col[:, :, None], out)
            out = jnp.where((mode_n == 10) & (rid == 0),
                            hor_row[:, None, :], out)

        rblk = Rr[:, y0:y0 + n, x0:x0 + n]
        rec = jnp.clip(out + rblk, 0, 255)
        cur = Fo[:, y0 + 1:y0 + 1 + n, x0 + 1:x0 + 1 + n]
        Fo[:, y0 + 1:y0 + 1 + n, x0 + 1:x0 + 1 + n] = jnp.where(
            _b3(tu_here[:, None], n) == log2, rec, cur.astype(jnp.int32)
        ).astype(Fo.dtype)


def _candidate_groups(C, max_tu):
    """Split the z-order walk at the top-level slots: Mosaic compile time
    grows superlinearly with kernel size (340 candidates measured >15 min,
    105 in 28 s at LB=8), and the per-quadrant subtrees are contiguous
    z-order runs, so chaining one pallas_call per subtree preserves the
    exact candidate order at ~4x smaller kernels."""
    cands = _zorder_candidates(C, max_tu)
    T = min(C, max_tu)
    nt = C // T
    if nt == 1:
        return [cands]
    per = len(cands) // (nt * nt)
    return [cands[i * per:(i + 1) * per] for i in range(nt * nt)]


def _make_kernel(C, max_tu, is_chroma, strong, group: int):
    cands = _candidate_groups(C, max_tu)[group]
    sizes = tuple(sorted({n for (n, _, _) in
                          _zorder_candidates(C, max_tu)}, reverse=True))

    def kernel(F_ref, Z_ref, R_ref, T_ref, M_ref, *rest):
        tb_refs = rest[:len(sizes) + 1]
        out_ref = rest[len(sizes) + 1]
        out_ref[...] = F_ref[...]
        Z = Z_ref[...]
        R = R_ref[...]
        T = T_ref[...]
        M = M_ref[...]
        tbs = {n: tb_refs[i][...] for i, n in enumerate(sizes)}
        ishor = tb_refs[len(sizes)][...]
        for (n, x0, y0) in cands:
            _candidate(out_ref, Z, R, T, M, tbs[n], ishor, n, x0, y0,
                       C, is_chroma, strong)
    return kernel, sizes


@functools.lru_cache(maxsize=64)
def _walk_call(C, max_tu, is_chroma, strong, B, HF, WF, HZ, WZ, fdt_name,
               lane_block, interpret, group):
    fdt = jnp.dtype(fdt_name)
    kernel, sizes = _make_kernel(C, max_tu, is_chroma, strong, group)
    tbls_np, _ = _pack_tables(sizes)
    C4 = C // 4
    grid = (B // lane_block,)
    bs = lambda shape: pl.BlockSpec(
        (lane_block,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    tbl_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for t in tbls_np]

    import os
    vmem_mb = int(os.environ.get("JMX_PALLAS_VMEM_MB", "96"))
    params = pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def run(F, Z, resid, tu, mode):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs((HF, WF)), bs((HZ, WZ)), bs((C, C)),
                      bs((C4, C4)), bs((C4, C4))] + tbl_specs,
            out_specs=bs((HF, WF)),
            out_shape=jax.ShapeDtypeStruct((B, HF, WF), fdt),
            input_output_aliases={0: 0},
            compiler_params=params,
            interpret=bool(interpret),
        )(F, Z, resid, tu, mode, *[jnp.asarray(t) for t in tbls_np])
    return run


def _pick_lane_block(B, fdt):
    """Lane block size: as large as the VMEM budget allows (the walk()
    wrapper pads B up to a multiple)."""
    import os
    cap = int(os.environ.get("JMX_PALLAS_LB", "8"))
    return min(cap, max(8, _cdiv(B, 8) * 8))


def make_pallas_walk(C: int, max_tu: int, is_chroma: bool, strong: bool):
    """Drop-in replacement for hevc_tiles._make_walk(...): returns
    walk(F, Z, resid, tu_t, mode_t, idx=None) -> F. The idx planes are
    ignored (mode tables are static kernel constants)."""

    def walk(F, Z, resid, tu_t, mode_t, idx=None):
        B, HF, WF = F.shape
        HZ, WZ = Z.shape[1], Z.shape[2]
        interpret = jax.default_backend() != "tpu"
        lb = _pick_lane_block(B, F.dtype)
        pad = (-B) % lb
        if pad:
            zpad = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            F, Z, resid, tu_t, mode_t = map(
                zpad, (F, Z, resid, tu_t, mode_t))
        Zi = Z.astype(jnp.int32)
        Ri = resid.astype(jnp.int32)
        Ti = tu_t.astype(jnp.int32)
        Mi = mode_t.astype(jnp.int32)
        n_groups = len(_candidate_groups(C, max_tu))
        out = F
        for grp in range(n_groups):
            run = _walk_call(C, max_tu, is_chroma, strong, B + pad, HF, WF,
                             HZ, WZ, F.dtype.name, lb, interpret, grp)
            out = run(out, Zi, Ri, Ti, Mi)
        return out[:B] if pad else out
    return walk
