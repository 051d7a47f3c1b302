"""Production H.264 encoder: device (TPU) P-frame core + host entropy pack.

Replaces the host encoder's per-MB Python motion search with the batched
exhaustive device ME + transform/quant kernel (kernels/encode_tiles.py);
the host keeps only skip derivation and CAVLC bitstream writing — the same
L1a/L1b split as the decoder (SURVEY §7.2). Capability analog of the
reference's NVENC submit pipeline (nv_enc/nv_enc.cpp:76-157).

Reconstruction runs through the existing device DECODE kernel on the very
symbol planes the encoder emits, so encoder recon == decoder recon by
construction, and the reference picture chain stays device-resident
(cuMemcpy-free, unlike nv_enc's upload path nv_enc.cpp:1023-1103).
"""

from __future__ import annotations

import numpy as np

from ...ops import transform as T
from ...utils.bits import BitWriter
from . import inter as INTER
from . import macroblock as MB
from . import nal
from .refenc import EncoderConfig, H264ReferenceEncoder, raster_to_scan4x4
from .slicehdr import SLICE_P, SliceHeader, write_slice_header


class DeviceH264Encoder(H264ReferenceEncoder):
    """H264ReferenceEncoder with the P-frame pixel math on the TPU.

    IDR frames use the host intra encoder (wavefront-free device intra
    mode decision is follow-up work); P frames run device ME + residual
    coding, with the DPB device-resident across frames.
    """

    def __init__(self, cfg: EncoderConfig):
        super().__init__(cfg)
        self._dev_ref = None  # (Yp, Up, Vp) MC_PAD-padded device planes

    def encode_idr(self, Y, U, V, qp=None) -> bytes:
        out = super().encode_idr(Y, U, V, qp=qp)
        from ...kernels import recon_tiles as RT
        import jax.numpy as jnp
        r = self.dpb[0]
        self._dev_ref = RT.pad_ref_device(
            jnp.asarray(r.Y.astype(np.uint8)),
            jnp.asarray(r.U.astype(np.uint8)),
            jnp.asarray(r.V.astype(np.uint8)))
        return out

    def encode_p(self, Y, U, V, qp=None) -> bytes:
        import jax.numpy as jnp
        from ...kernels import recon_tiles as RT
        from ...kernels.encode_tiles import SEARCH_RANGE, encode_p_frame
        from .symbols import FrameSymbols

        qp = self.cfg.qp if qp is None else int(qp)
        Yp = self._pad(np.asarray(Y, np.int32))
        Up = self._pad(np.asarray(U, np.int32), c=True)
        Vp = self._pad(np.asarray(V, np.int32), c=True)
        lam = max(1, 1 << max(0, (qp - 12) // 6))
        qpc_cb = int(T.chroma_qp(qp, self.pps.chroma_qp_offset(0)))
        qpc_cr = int(T.chroma_qp(qp, self.pps.chroma_qp_offset(1)))
        rng = min(SEARCH_RANGE, self.cfg.search_range)

        mv_d, luma_z_d, chroma_ac_d, chroma_dc_d, _sad = encode_p_frame(
            self.mbh, self.mbw, rng,
            jnp.asarray(Yp), jnp.asarray(Up), jnp.asarray(Vp),
            *self._dev_ref,
            jnp.int32(qp), jnp.int32(qpc_cb), jnp.int32(qpc_cr),
            jnp.int32(lam))
        # ONE device->host pull: the tunnel charges ~0.3-1 s LATENCY per
        # transfer regardless of size, so four separate np.asarray calls
        # cost more than the bytes themselves (measured r5)
        flat = jnp.concatenate([
            mv_d.astype(jnp.int16).ravel(),
            luma_z_d.astype(jnp.int16).ravel(),
            chroma_ac_d.astype(jnp.int16).ravel(),
            chroma_dc_d.astype(jnp.int16).ravel()])
        host = np.asarray(flat).astype(np.int32)
        o0 = mv_d.size
        o1 = o0 + luma_z_d.size
        o2 = o1 + chroma_ac_d.size
        mv = host[:o0].reshape(mv_d.shape)
        luma_z = host[o0:o1].reshape(luma_z_d.shape)
        chroma_ac = host[o1:o2].reshape(chroma_ac_d.shape)
        chroma_dc = host[o2:].reshape(chroma_dc_d.shape)

        # ---- host entropy pack (skip-run + CAVLC slice writing) ----
        self.frame_num = (self.frame_num + 1) % (
            1 << self.sps.log2_max_frame_num)
        hdr = SliceHeader(
            slice_type=SLICE_P, frame_num=self.frame_num, is_idr=False,
            nal_ref_idc=2, num_ref_idx_active_l0=1,
            slice_qp_delta=qp - self.pps.pic_init_qp,
            disable_deblocking_filter_idc=(
                1 if self.cfg.disable_deblock else 0))
        sw = write_slice_header(hdr, self.sps, self.pps)
        g = MB.MBGrids(self.mbw, self.mbh)
        m = INTER.MotionGrids(self.mbw, self.mbh)
        skip_run = 0
        for my in range(self.mbh):
            for mx in range(self.mbw):
                s, is_skip = self._pack_p_mb(g, m, my, mx, qp, mv, luma_z,
                                             chroma_ac, chroma_dc)
                if is_skip:
                    skip_run += 1
                    continue
                sw.ue(skip_run)
                skip_run = 0
                INTER.write_p_macroblock(sw, g, m, my, mx, 0, qp, s, 1)
        if skip_run:
            sw.ue(skip_run)
        sw.rbsp_trailing_bits()

        # ---- reconstruction through the device DECODE kernel ----
        fs = FrameSymbols(self.mbw, self.mbh)
        fs.mb_class[:] = INTER.MB_P
        fs.qp[:] = qp
        fs.luma_coeffs = luma_z
        fs.chroma_coeffs = chroma_ac
        fs.chroma_dc[:] = chroma_dc
        fs.mv = np.repeat(np.repeat(mv, 4, 0), 4, 1)
        fs.ref = np.zeros((self.mbh * 4, self.mbw * 4), np.int32)
        fs.fill_availability(np.zeros((self.mbh, self.mbw), np.int32))
        fs.deblock_enabled = not self.cfg.disable_deblock
        fs.chroma_qp_off = self.pps.chroma_qp_index_offset
        fs.second_chroma_qp_off = fs.chroma_qp_off
        Yd, Ud, Vd = RT.decode_frame_inter(
            self.mbh, self.mbw,
            jnp.asarray(fs.mb_class), jnp.asarray(fs.qp),
            jnp.asarray(fs.i4_modes), jnp.asarray(fs.i16_mode),
            jnp.asarray(fs.chroma_mode), jnp.asarray(fs.luma_coeffs),
            jnp.asarray(fs.luma_dc), jnp.asarray(fs.chroma_coeffs),
            jnp.asarray(fs.chroma_dc), jnp.asarray(fs.avail_left),
            jnp.asarray(fs.avail_top), jnp.asarray(fs.avail_topright),
            jnp.int32(0), jnp.int32(0), jnp.int32(fs.chroma_qp_off),
            jnp.int32(fs.second_chroma_qp_off),
            jnp.asarray(fs.mv), jnp.asarray(fs.ref), *(
                p[None] for p in self._dev_ref),
            deblock=fs.deblock_enabled)
        self._dev_ref = RT.pad_ref_device(Yd, Ud, Vd)
        # host DPB mirror stays LAZY: the device P chain references only
        # _dev_ref; a host consumer (np.asarray) pulls on demand — three
        # eager pulls here cost ~1.5 s of pure tunnel latency per frame
        self.last_recon = (Yd, Ud, Vd)
        from .refdec import RefPicture
        self.dpb = [RefPicture(self.frame_num, Yd.astype(jnp.int32),
                               Ud.astype(jnp.int32), Vd.astype(jnp.int32))]
        return nal.write_nal_unit(2, nal.NAL_SLICE_NON_IDR, sw.bytes())

    def _pack_p_mb(self, g, m, my, mx, qp, mv, luma_z, chroma_ac, chroma_dc):
        """Build PMBSymbols for one MB from the device symbol planes."""
        s = INTER.PMBSymbols()
        s.mb_class = INTER.MB_P
        s.p_type = INTER.P_16x16
        s.qp = qp
        mbmv = np.array([int(mv[my, mx, 0]), int(mv[my, mx, 1])], np.int32)
        s.partitions = [INTER.InterPartition(my * 4, mx * 4, 4, 4, 0, mbmv)]
        cbp = 0
        for i in range(16):
            bx4, by4 = int(MB.BLK_X[i]) // 4, int(MB.BLK_Y[i]) // 4
            zb = luma_z[my * 4 + by4, mx * 4 + bx4]
            s.luma_ac[i] = raster_to_scan4x4(zb)
            if zb.any():
                cbp |= 1 << (i >> 2)
        s.cbp_luma = cbp
        any_dc = any_ac = False
        for comp in range(2):
            zdc = chroma_dc[comp, my, mx]
            if zdc.any():
                any_dc = True
            s.chroma_dc[comp] = [int(v) for v in zdc.reshape(4)]
            for i in range(4):
                zb = chroma_ac[comp, my * 2 + i // 2, mx * 2 + i % 2]
                if zb.any():
                    any_ac = True
                s.chroma_ac[comp][i] = raster_to_scan4x4(zb, ac_only=True)
        s.cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
        # provisional marking so skip/mv prediction sees this MB as inter
        g.mb_class[my, mx] = INTER.MB_P
        g.slice_id[my, mx] = 0
        if (s.cbp_luma == 0 and s.cbp_chroma == 0):
            skip_mv = INTER.pskip_mv(g, m, my, mx, 0)
            if mbmv[0] == skip_mv[0] and mbmv[1] == skip_mv[1]:
                INTER.apply_skip(g, m, my, mx, 0, qp)
                return s, True
        g.qp[my, mx] = qp
        return s, False


def encode_stream_device(frames, width, height, qp=28, gop_len=8,
                         disable_deblock=False) -> bytes:
    """Convenience: encode frames with the device encoder -> Annex-B."""
    cfg = EncoderConfig(width=width, height=height, qp=qp, gop_len=gop_len,
                        disable_deblock=disable_deblock)
    enc = DeviceH264Encoder(cfg)
    out = [enc.headers_annexb()]
    for (Y, U, V) in frames:
        out.append(enc.encode_frame(Y, U, V))
    return b"".join(out)
