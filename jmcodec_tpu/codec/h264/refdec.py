"""Pure-numpy H.264 reference decoder (intra/CAVLC scope for the walking
skeleton; SURVEY §7.3 step 1). Serves as the always-available CPU oracle, the
analog of the reference's MFX_IMPL_SOFTWARE fallback
(intel_dec/intel_dec.cpp:394-396).

Pipeline per frame: parse slice(s) -> per-MB intra recon on the *unfiltered*
frame -> deblocking pass -> output. Exposes decoded symbol planes so the TPU
device recon path can be driven by the same entropy front-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...ops import deblock as DB
from ...ops import intra as IP
from ...ops import transform as T
from ...utils.bits import BitReader
from . import macroblock as MB
from . import nal
from .params import PPS, SPS, parse_pps, parse_sps
from .slicehdr import SLICE_I, parse_slice_header
from .symbols import (MBCLASS_I4x4, MBCLASS_I16x16, MBCLASS_IPCM,
                      FrameSymbols)


def scan_to_raster4x4(scan: List[int], dc: Optional[int] = None) -> np.ndarray:
    """Scan-order coefficient list -> 4x4 raster block. If dc is given, the
    list holds 15 AC coefficients for scan positions 1..15."""
    flat = np.zeros(16, np.int32)
    if dc is None:
        flat[T.ZIGZAG4x4] = np.asarray(scan[:16], np.int32)
    else:
        flat[T.ZIGZAG4x4[1:]] = np.asarray(scan[:15], np.int32)
        flat[0] = dc
    return flat.reshape(4, 4)


def _tr_available(g: MB.MBGrids, my: int, mx: int, blk_idx: int,
                  by: int, bx: int, cur_slice: int) -> bool:
    """Top-right availability of luma 4x4 block (by,bx) = block blk_idx of MB
    (my,mx), following decode order (spec 6.4.11)."""
    nbx, nby = bx + 1, by - 1
    if nby < 0 or nbx >= g.mb_width * 4:
        return False
    nmy, nmx = nby // 4, nbx // 4
    if (nmy, nmx) == (my, mx):
        return blk_idx not in MB.TR_UNAVAILABLE_IN_MB
    return g.mb_available(nmy, nmx, cur_slice)


def recon_i4_block(Y: np.ndarray, g: MB.MBGrids, my: int, mx: int,
                   blk_idx: int, mode: int, resid: np.ndarray,
                   cur_slice: int) -> None:
    """Reconstruct one intra 4x4 luma block in place on the unfiltered frame."""
    x = mx * 16 + int(MB.BLK_X[blk_idx])
    y = my * 16 + int(MB.BLK_Y[blk_idx])
    by, bx = y // 4, x // 4
    # left/top neighbors inside the current MB precede this block in decode
    # order, so they are always available; across MB boundaries availability
    # follows the slice/decoded state.
    if bx == 0:
        avail_l = False
    elif (bx - 1) // 4 == mx:
        avail_l = True
    else:
        avail_l = g.mb_available(my, mx - 1, cur_slice)
    if by == 0:
        avail_t = False
    elif (by - 1) // 4 == my:
        avail_t = True
    else:
        avail_t = g.mb_available(my - 1, mx, cur_slice)
    avail_tr = _tr_available(g, my, mx, blk_idx, by, bx, cur_slice)

    t8 = np.zeros(8, np.int32)
    l4 = np.zeros(4, np.int32)
    tl = 0
    if avail_t:
        t8[:4] = Y[y - 1, x:x + 4]
        if avail_tr:
            t8[4:] = Y[y - 1, x + 4:x + 8]
        else:
            t8[4:] = t8[3]
    if avail_l:
        l4[:] = Y[y:y + 4, x - 1]
    if avail_t and avail_l:
        tl = int(Y[y - 1, x - 1])
    pred = IP.pred4x4(mode, t8, l4, tl, avail_t, avail_l)
    Y[y:y + 4, x:x + 4] = np.clip(pred + resid, 0, 255)


@dataclass
class DecodedFrame:
    Y: np.ndarray
    U: np.ndarray
    V: np.ndarray
    poc: int = 0
    frame_num: int = 0
    is_idr: bool = True
    qp_mb: Optional[np.ndarray] = None
    pre_deblock: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
    symbols: Optional["FrameSymbols"] = None

    def crop(self, sps: SPS):
        w, h = sps.width, sps.height
        return (self.Y[:h, :w], self.U[:h // 2, :w // 2], self.V[:h // 2, :w // 2])


class H264ReferenceDecoder:
    """Stateful Annex-B decoder (intra profile subset)."""

    def __init__(self):
        self.sps: Dict[int, SPS] = {}
        self.pps: Dict[int, PPS] = {}
        self.frames: List[DecodedFrame] = []

    def decode_annexb(self, data: bytes) -> List[DecodedFrame]:
        out = []
        slices = []
        for u in nal.parse_nal_units(data):
            if u.nal_unit_type == nal.NAL_SPS:
                s = parse_sps(u.rbsp)
                self.sps[s.seq_parameter_set_id] = s
            elif u.nal_unit_type == nal.NAL_PPS:
                p = parse_pps(u.rbsp)
                self.pps[p.pic_parameter_set_id] = p
            elif u.is_slice:
                slices.append(u)
        # group slices into pictures by first_mb_in_slice == 0 boundaries
        cur: List[nal.NalUnit] = []
        pics: List[List[nal.NalUnit]] = []
        for u in slices:
            r = BitReader(u.rbsp)
            first_mb = r.ue()
            if first_mb == 0 and cur:
                pics.append(cur)
                cur = []
            cur.append(u)
        if cur:
            pics.append(cur)
        for pic in pics:
            out.append(self.decode_picture(pic))
        self.frames.extend(out)
        return out

    def decode_picture(self, units: List[nal.NalUnit]) -> DecodedFrame:
        # parse first slice header to size the frame
        h0, _ = parse_slice_header(units[0].rbsp,
                                   self._sps_for(units[0]), self._pps_for(units[0]),
                                   units[0].nal_unit_type, units[0].nal_ref_idc)
        pps = self.pps[h0.pic_parameter_set_id]
        sps = self.sps[pps.seq_parameter_set_id]
        mbw, mbh = sps.mb_width, sps.mb_height
        Y = np.zeros((mbh * 16, mbw * 16), np.int32)
        U = np.zeros((mbh * 8, mbw * 8), np.int32)
        V = np.zeros((mbh * 8, mbw * 8), np.int32)
        g = MB.MBGrids(mbw, mbh)
        fs = FrameSymbols(mbw, mbh)
        deblock_params = []

        for slice_idx, u in enumerate(units):
            hdr, r = parse_slice_header(u.rbsp, sps, pps, u.nal_unit_type,
                                        u.nal_ref_idc)
            if hdr.slice_type != SLICE_I:
                raise NotImplementedError("only I slices in reference decoder (round 1)")
            if pps.entropy_coding_mode_flag:
                raise NotImplementedError("CABAC")
            self._decode_slice_data(r, hdr, sps, pps, g, Y, U, V, slice_idx, fs)
            deblock_params.append(hdr)

        pre = (Y.copy(), U.copy(), V.copy())
        hdr = deblock_params[0]
        fs.fill_availability(g.slice_id)
        fs.deblock_enabled = hdr.disable_deblocking_filter_idc != 1
        fs.alpha_off = hdr.slice_alpha_c0_offset_div2 * 2
        fs.beta_off = hdr.slice_beta_offset_div2 * 2
        fs.chroma_qp_off = pps.chroma_qp_index_offset
        fs.second_chroma_qp_off = (pps.second_chroma_qp_index_offset
                                   if pps.second_chroma_qp_index_offset is not None
                                   else pps.chroma_qp_index_offset)
        if fs.deblock_enabled:
            bs_v, bs_h = DB.intra_frame_bs(mbh, mbw)
            DB.deblock_frame(Y, U, V, g.qp, bs_v, bs_h,
                             alpha_off=fs.alpha_off, beta_off=fs.beta_off,
                             chroma_qp_off=pps.chroma_qp_index_offset,
                             second_chroma_qp_off=pps.second_chroma_qp_index_offset)
        return DecodedFrame(
            Y=Y.astype(np.uint8), U=U.astype(np.uint8), V=V.astype(np.uint8),
            frame_num=hdr.frame_num, is_idr=hdr.is_idr, qp_mb=g.qp.copy(),
            pre_deblock=pre, symbols=fs)

    def _sps_for(self, u: nal.NalUnit) -> SPS:
        # slice header parsing needs sps/pps; peek pps id quickly
        r = BitReader(u.rbsp)
        r.ue()  # first_mb
        r.ue()  # slice_type
        pps_id = r.ue()
        return self.sps[self.pps[pps_id].seq_parameter_set_id]

    def _pps_for(self, u: nal.NalUnit) -> PPS:
        r = BitReader(u.rbsp)
        r.ue()
        r.ue()
        return self.pps[r.ue()]

    def _decode_slice_data(self, r: BitReader, hdr, sps: SPS, pps: PPS,
                           g: MB.MBGrids, Y, U, V, slice_idx: int,
                           fs: Optional[FrameSymbols] = None) -> None:
        mbw = sps.mb_width
        qp = pps.pic_init_qp + hdr.slice_qp_delta
        addr = hdr.first_mb_in_slice
        while True:
            my, mx = divmod(addr, mbw)
            if my >= sps.mb_height:
                raise ValueError("MB address out of range")
            mb_type = r.ue()
            s = MB.parse_i_macroblock(r, g, my, mx, slice_idx, qp, mb_type)
            qp = s.qp
            reconstruct_intra_mb(Y, U, V, g, my, mx, slice_idx, s, pps)
            if fs is not None:
                fill_mb_symbols(fs, my, mx, s)
            addr += 1
            if not r.more_rbsp_data():
                break


def fill_mb_symbols(fs: FrameSymbols, my: int, mx: int, s: MB.MBSymbols) -> None:
    """Record one parsed MB into the dense symbol planes."""
    fs.qp[my, mx] = s.qp
    if s.mb_class == MB.MB_IPCM:
        fs.mb_class[my, mx] = MBCLASS_IPCM
        fs.has_pcm = True
        if fs.pcm_y is None:
            fs.pcm_y = np.zeros((fs.mb_height * 16, fs.mb_width * 16), np.int32)
            fs.pcm_u = np.zeros((fs.mb_height * 8, fs.mb_width * 8), np.int32)
            fs.pcm_v = np.zeros((fs.mb_height * 8, fs.mb_width * 8), np.int32)
        fs.pcm_y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = np.frombuffer(
            s.pcm_luma, np.uint8).reshape(16, 16)
        fs.pcm_u[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = np.frombuffer(
            s.pcm_chroma[:64], np.uint8).reshape(8, 8)
        fs.pcm_v[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = np.frombuffer(
            s.pcm_chroma[64:], np.uint8).reshape(8, 8)
        return
    is16 = s.mb_class == MB.MB_I16x16
    fs.mb_class[my, mx] = MBCLASS_I16x16 if is16 else MBCLASS_I4x4
    fs.i16_mode[my, mx] = s.i16_mode
    fs.chroma_mode[my, mx] = s.chroma_mode
    for i in range(16):
        bx = mx * 4 + int(MB.BLK_X[i]) // 4
        by = my * 4 + int(MB.BLK_Y[i]) // 4
        if is16:
            fs.luma_coeffs[by, bx] = scan_to_raster4x4(s.luma_ac[i], dc=0)
            fs.i4_modes[by, bx] = 0
        else:
            fs.luma_coeffs[by, bx] = scan_to_raster4x4(s.luma_ac[i])
            fs.i4_modes[by, bx] = s.i4_modes[i]
    if is16:
        fs.luma_dc[my, mx] = scan_to_raster4x4(s.luma_dc)
    for comp in range(2):
        fs.chroma_dc[comp, my, mx] = np.asarray(
            s.chroma_dc[comp], np.int32).reshape(2, 2)
        for i in range(4):
            bx = mx * 2 + int(MB.CBLK_X[i]) // 4
            by = my * 2 + int(MB.CBLK_Y[i]) // 4
            fs.chroma_coeffs[comp, by, bx] = scan_to_raster4x4(
                list(s.chroma_ac[comp][i]), dc=0)


def reconstruct_intra_mb(Y, U, V, g: MB.MBGrids, my: int, mx: int,
                         cur_slice: int, s: MB.MBSymbols, pps: PPS) -> None:
    """Reconstruct one intra MB onto the unfiltered frame planes (int32)."""
    x0, y0 = mx * 16, my * 16
    if s.mb_class == MB.MB_IPCM:
        Y[y0:y0 + 16, x0:x0 + 16] = np.frombuffer(
            s.pcm_luma, np.uint8).reshape(16, 16)
        cb = np.frombuffer(s.pcm_chroma[:64], np.uint8).reshape(8, 8)
        cr = np.frombuffer(s.pcm_chroma[64:], np.uint8).reshape(8, 8)
        U[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cb
        V[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cr
        return

    qp = s.qp
    if s.mb_class == MB.MB_I4x4:
        for i in range(16):
            blk = scan_to_raster4x4(s.luma_ac[i])
            d = T.np_dequant_4x4(blk, qp)
            resid = T.np_inverse_transform_4x4(d)
            recon_i4_block(Y, g, my, mx, i, s.i4_modes[i], resid, cur_slice)
    else:
        # I16x16: prediction over the whole MB from unfiltered neighbors
        avail_l = g.mb_available(my, mx - 1, cur_slice)
        avail_t = g.mb_available(my - 1, mx, cur_slice)
        t16 = Y[y0 - 1, x0:x0 + 16] if avail_t else np.zeros(16, np.int32)
        l16 = Y[y0:y0 + 16, x0 - 1] if avail_l else np.zeros(16, np.int32)
        tl = int(Y[y0 - 1, x0 - 1]) if (avail_t and avail_l) else 0
        pred = IP.pred16x16(s.i16_mode, t16, l16, tl, avail_t, avail_l)
        dc_blk = scan_to_raster4x4(s.luma_dc)
        dc_vals = T.np_luma_dc_decode(dc_blk, qp)  # [4,4] per-block DC
        mbres = np.zeros((16, 16), np.int32)
        for i in range(16):
            bx, by = int(MB.BLK_X[i]), int(MB.BLK_Y[i])
            ac = scan_to_raster4x4(s.luma_ac[i], dc=0)
            d = T.np_dequant_4x4(ac, qp)
            d[0, 0] = dc_vals[by // 4, bx // 4]
            mbres[by:by + 4, bx:bx + 4] = T.np_inverse_transform_4x4(d)
        Y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred + mbres, 0, 255)

    # chroma
    cx0, cy0 = mx * 8, my * 8
    avail_l = g.mb_available(my, mx - 1, cur_slice)
    avail_t = g.mb_available(my - 1, mx, cur_slice)
    for comp, plane in ((0, U), (1, V)):
        qpc = int(T.chroma_qp(qp, pps.chroma_qp_offset(comp)))
        t8 = plane[cy0 - 1, cx0:cx0 + 8] if avail_t else np.zeros(8, np.int32)
        l8 = plane[cy0:cy0 + 8, cx0 - 1] if avail_l else np.zeros(8, np.int32)
        tl = int(plane[cy0 - 1, cx0 - 1]) if (avail_t and avail_l) else 0
        pred = IP.pred_chroma8x8(s.chroma_mode, t8, l8, tl, avail_t, avail_l)
        dc2 = np.asarray(s.chroma_dc[comp], np.int32).reshape(2, 2)
        dc_vals = T.np_chroma_dc_decode(dc2, qpc)
        res = np.zeros((8, 8), np.int32)
        for i in range(4):
            bx, by = int(MB.CBLK_X[i]), int(MB.CBLK_Y[i])
            ac = scan_to_raster4x4(list(s.chroma_ac[comp][i]), dc=0)
            d = T.np_dequant_4x4(ac, qpc)
            d[0, 0] = dc_vals[by // 4, bx // 4]
            res[by:by + 4, bx:bx + 4] = T.np_inverse_transform_4x4(d)
        plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(pred + res, 0, 255)
