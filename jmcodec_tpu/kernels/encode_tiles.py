"""Device (TPU) H.264 P-frame encoder core: exhaustive batched motion
estimation + sub-pel refinement + transform/quant — the encode silicon the
reference delegates to (NVENC submit pipeline, nv_enc/nv_enc.cpp:76-157;
QSV EncodeFrameAsync, intel_enc/intel_enc.cpp:917).

TPU-first design notes (SURVEY §7.2 L1b):
- Motion search is an EXHAUSTIVE full-pel scan over the (2R+1)^2 window,
  evaluated for every macroblock of the frame at once — each candidate is
  one shifted full-frame abs-diff + per-MB reduction (VPU-friendly), looped
  with lax.scan. No serial diamond heuristics: the batched full search is
  both faster on this hardware and finds better minima.
- Sub-pel refinement reuses the decoder's half-pel plane pyramid
  (recon_tiles._halfpel_planes) + the batched per-cell MC gather, so the
  encoder's prediction is bit-identical to what any conformant decoder
  reconstructs for the chosen MV.
- Residual transform + quantisation are the batched [..., 4, 4] integer
  kernels from ops/transform.py (MXU/VPU matmul shapes).
- Reconstruction is NOT re-implemented: the caller feeds the produced
  symbol planes through the existing device decode kernel
  (recon_tiles.decode_frame_inter), so encoder recon == decoder recon by
  construction.

The rate-bias tables approximate mvd cost against a zero predictor (the
true predictor is the serial median; the bias only steers ties toward
short vectors — any chosen MV is legal and is coded exactly downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import transform as T
from .recon_tiles import (MC_PAD, _halfpel_planes, _mc_chroma_batched,
                          _mc_luma_batched)

SEARCH_RANGE = 16  # full-pel; MC_PAD=32 leaves margin for subpel taps


def _se_len(v: int) -> int:
    """Bit length of se(v) Exp-Golomb (host-side table builder)."""
    k = 2 * abs(v) - (1 if v > 0 else 0)
    return 2 * (k + 1).bit_length() - 1


@functools.lru_cache()
def _fullpel_bias(rng: int):
    """[(2R+1)^2] int32 mvd-bit counts of (4dx, 4dy) vs a zero predictor,
    in scan order (dy major, dx minor)."""
    bits = np.zeros((2 * rng + 1) * (2 * rng + 1), np.int32)
    i = 0
    for dy in range(-rng, rng + 1):
        for dx in range(-rng, rng + 1):
            bits[i] = _se_len(4 * dx) + _se_len(4 * dy)
            i += 1
    return bits


@functools.lru_cache()
def _qpel_bits_table(rng: int):
    """Bits of se(v) for quarter-pel component v in [-4(R+1), 4(R+1)]."""
    lim = 4 * (rng + 2)
    return np.array([_se_len(v) for v in range(-lim, lim + 1)],
                    np.int32), lim


def _mb_sad(diff_abs, mbh, mbw):
    """[H, W] absolute differences -> per-MB SAD [mbh, mbw]."""
    return diff_abs.reshape(mbh, 16, mbw, 16).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "rng"))
def me_p_frame(mbh: int, mbw: int, rng: int, src_y, ref_y, lam):
    """Full-pel exhaustive ME + half/quarter-pel refinement, all MBs at
    once. src_y: [H, W] int32 (H=16*mbh); ref_y: [Hp, Wp] int32 padded by
    MC_PAD. Returns (mv [mbh, mbw, 2] quarter-pel int32, sad [mbh, mbw])."""
    H, W = 16 * mbh, 16 * mbw
    offs = np.stack(np.mgrid[-rng:rng + 1, -rng:rng + 1], -1).reshape(-1, 2)
    bias_np = _fullpel_bias(rng)
    # chunk K candidates per scan step: the per-candidate MATH (~6 MOp of
    # abs-diff + reduce) is far below the measured ~1.5 ms/step, so the
    # scan was step-overhead-bound; 16 candidates amortize it (the search
    # stays EXHAUSTIVE — padding duplicates the last offset harmlessly)
    K = 16
    pad = (-len(offs)) % K
    if pad:
        offs = np.concatenate([offs, np.repeat(offs[-1:], pad, 0)])
        bias_np = np.concatenate([bias_np, np.repeat(bias_np[-1:], pad)])
    bias = jnp.asarray(bias_np)
    offs_j = jnp.asarray(offs)  # (dy, dx)

    def step(carry, i0):
        best_cost, best_mv = carry
        for j in range(K):
            i = i0 * K + j
            dy, dx = offs_j[i, 0], offs_j[i, 1]
            win = lax.dynamic_slice(ref_y, (MC_PAD + dy, MC_PAD + dx),
                                    (H, W))
            sad = _mb_sad(jnp.abs(win - src_y), mbh, mbw)
            cost = sad + lam * bias[i]
            better = cost < best_cost
            mvq = jnp.stack([dx * 4, dy * 4])
            best_mv = jnp.where(better[..., None], mvq[None, None, :],
                                best_mv)
            best_cost = jnp.where(better, cost, best_cost)
        return (best_cost, best_mv), None

    init = (jnp.full((mbh, mbw), 1 << 30, jnp.int32),
            jnp.zeros((mbh, mbw, 2), jnp.int32))
    (cost, mv), _ = lax.scan(step, init, jnp.arange(len(offs) // K))

    # sub-pel refinement on the half-pel plane pyramid (spec-exact interp)
    planes = _halfpel_planes(ref_y[None])
    bits_t, lim = _qpel_bits_table(rng)
    bits_j = jnp.asarray(bits_t)

    def mb_cost(cand_mv):
        """cand_mv: [mbh, mbw, 2] quarter-pel -> (cost, sad)."""
        cell_mv = jnp.repeat(jnp.repeat(cand_mv, 4, 0), 4, 1)
        zref = jnp.zeros((mbh * 4, mbw * 4), jnp.int32)
        pred = _mc_luma_batched_from_planes(planes, cell_mv, zref)
        predp = _cells_to_plane(pred)
        sad = _mb_sad(jnp.abs(predp - src_y), mbh, mbw)
        b = (bits_j[jnp.clip(cand_mv[..., 0], -lim, lim) + lim] +
             bits_j[jnp.clip(cand_mv[..., 1], -lim, lim) + lim])
        return sad + lam * b, sad

    best_cost, best_sad = mb_cost(mv)
    best_mv = mv
    for stepq in (2, 1):
        center = best_mv
        for dy, dx in ((-stepq, 0), (stepq, 0), (0, -stepq), (0, stepq),
                       (-stepq, -stepq), (stepq, stepq),
                       (-stepq, stepq), (stepq, -stepq)):
            cand = center + jnp.asarray([dx, dy], jnp.int32)
            cost_c, sad_c = mb_cost(cand)
            better = cost_c < best_cost
            best_mv = jnp.where(better[..., None], cand, best_mv)
            best_sad = jnp.where(better, sad_c, best_sad)
            best_cost = jnp.where(better, cost_c, best_cost)
    return best_mv, best_sad


def _mc_luma_batched_from_planes(planes_tuple, mv, ref_idx):
    """_mc_luma_batched with precomputed half-pel planes (single ref)."""
    G, b, hh, jj = planes_tuple
    refp = G  # [1, Hp, Wp]
    # reuse the gather logic by stacking the planes like _mc_luma_batched
    from .recon_tiles import _MC_SEL
    n_refs, Hp, Wp = refp.shape
    planes = jnp.stack([G, b, hh, jj], axis=1)
    gh, gw = mv.shape[0], mv.shape[1]
    bys, bxs = np.mgrid[0:gh, 0:gw]
    x0 = bxs * 4 + MC_PAD
    y0 = bys * 4 + MC_PAD
    mvx, mvy = mv[..., 0], mv[..., 1]
    xi = jnp.clip(x0 + (mvx >> 2), 3, Wp - 8)
    yi = jnp.clip(y0 + (mvy >> 2), 3, Hp - 8)
    sel = jnp.asarray(_MC_SEL)[mvy & 3, mvx & 3]
    r = jnp.clip(ref_idx, 0, n_refs - 1)

    def gather_plane(pids, dxs, dys):
        rows = (yi + dys)[..., None, None] + np.arange(4)[None, None, :, None]
        cols = (xi + dxs)[..., None, None] + np.arange(4)[None, None, None, :]
        return planes[r[..., None, None], pids[..., None, None], rows, cols]

    p1 = gather_plane(sel[..., 0], sel[..., 1], sel[..., 2])
    p2 = gather_plane(sel[..., 3], sel[..., 4], sel[..., 5])
    avg = (p1 + p2 + 1) >> 1
    return jnp.where((sel[..., 6] == 1)[..., None, None], avg, p1)


# mode-decision lambda2 table: round(0.85 * 2^((qp-12)/3)) per QP
_LAMBDA2_T = np.maximum(1, np.round(
    0.85 * 2.0 ** ((np.arange(52) - 12) / 3.0))).astype(np.int32)


def _cells_to_plane(cells):
    """[gh, gw, n, n] -> [gh*n, gw*n]."""
    gh, gw, n, _ = cells.shape
    return cells.transpose(0, 2, 1, 3).reshape(gh * n, gw * n)


def _plane_to_cells(plane, n):
    H, W = plane.shape
    return plane.reshape(H // n, n, W // n, n).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "rng"))
def encode_p_frame(mbh: int, mbw: int, rng: int, src_y, src_u, src_v,
                   ref_y, ref_u, ref_v, qp, qpc_cb, qpc_cr, lam):
    """Full device P-frame encode front-end (single reference, P_16x16).

    src planes int32 (MB-padded); ref planes MC_PAD-padded int32.
    Returns (mv [mbh,mbw,2], luma_z [mbh*4,mbw*4,4,4],
             chroma_ac [2,mbh*2,mbw*2,4,4] (DC position zeroed),
             chroma_dc [2,mbh,mbw,2,2], sad [mbh,mbw]) — the symbol planes
    a decoder needs (FrameSymbols layout)."""
    mv, sad = me_p_frame(mbh, mbw, rng, src_y, ref_y, lam)

    # final prediction (spec-exact, shared with the decoder)
    cell_mv = jnp.repeat(jnp.repeat(mv, 4, 0), 4, 1)
    zref = jnp.zeros((mbh * 4, mbw * 4), jnp.int32)
    pred_y = _cells_to_plane(
        _mc_luma_batched(ref_y[None], cell_mv, zref, mbh, mbw))
    pred_u = _cells_to_plane(
        _mc_chroma_batched(ref_u[None], cell_mv, zref, mbh, mbw))
    pred_v = _cells_to_plane(
        _mc_chroma_batched(ref_v[None], cell_mv, zref, mbh, mbw))

    mf = jnp.asarray(T.QUANT_MF4x4)

    # luma residual -> 4x4 DCT -> quant (inter rounding)
    resid = _plane_to_cells(src_y - pred_y, 4)
    w = T.forward_transform_4x4(resid, jnp)
    luma_z = T.quant_4x4(w, qp, False, jnp, mf)

    # ---- first RDO: per-4x4-block rate-distortion thresholding ----
    # J = SSD + lambda2*R. A block's coefficients are dropped when the
    # distortion they remove is worth less than the bits they cost —
    # x264's coefficient-level analog, batched over the whole frame.
    # lambda2 = 0.85 * 2^((qp-12)/3) (the H.264 mode-decision lambda).
    lam2 = jnp.asarray(_LAMBDA2_T)[jnp.clip(qp, 0, 51)]
    dqt = jnp.asarray(T.DEQUANT4x4)
    rec_res = T.inverse_transform_4x4(
        T.dequant_4x4(luma_z, qp, jnp, dqt), jnp)
    d_keep = jnp.sum((resid - rec_res) ** 2, axis=(-1, -2))
    d_zero = jnp.sum(resid ** 2, axis=(-1, -2))
    absz = jnp.abs(luma_z)
    # CAVLC-flavoured rate: ~2*bitlen(level)+1 per nonzero coefficient
    # plus a coeff_token/run overhead per coded block
    bl = jnp.where(absz > 0, jnp.floor(
        jnp.log2(jnp.maximum(absz, 1).astype(jnp.float32))
    ).astype(jnp.int32) + 1, 0)
    r_blk = jnp.sum(jnp.where(absz > 0, 2 * bl + 1, 0), axis=(-1, -2)) \
        + 4 * jnp.any(absz > 0, axis=(-1, -2)).astype(jnp.int32)
    drop = (d_zero - d_keep) <= lam2 * r_blk
    luma_z = jnp.where(drop[..., None, None], 0, luma_z)

    # chroma: per-plane 4x4 DCT; 2x2 DC hadamard quant + AC quant
    chroma_ac = []
    chroma_dc = []
    for (srcc, predc, qpc) in ((src_u, pred_u, qpc_cb),
                               (src_v, pred_v, qpc_cr)):
        residc = _plane_to_cells(srcc - predc, 4)        # [mbh*2, mbw*2,4,4]
        wc = T.forward_transform_4x4(residc, jnp)
        dc = wc[..., 0, 0]                               # [mbh*2, mbw*2]
        dc22 = _plane_to_cells(dc, 2)                    # [mbh, mbw, 2, 2]
        dch = T.hadamard_2x2(dc22, jnp)
        zdc = T.quant_dc(dch, qpc, jnp, mf)
        zac = T.quant_4x4(wc, qpc, False, jnp, mf)
        zac = zac.at[..., 0, 0].set(0)
        chroma_ac.append(zac)
        chroma_dc.append(zdc)

    return (mv, luma_z, jnp.stack(chroma_ac), jnp.stack(chroma_dc), sad)
