"""Session API: capability parity with the reference's 44 C exports
(SURVEY §2.1 rows 2/4/6/8), re-shaped as Python sessions around the TPU codec
core.

Mapping (reference export -> here):
  jm_intel_dec_create_handle/init      -> DecoderSession(codec, out_fmt)
  jm_intel_dec_input_data              -> DecoderSession.input_data
  jm_intel_dec_need_more_data          -> DecoderSession.need_more_data
  jm_intel_dec_free_buf_len            -> DecoderSession.free_buf_len
  jm_intel_dec_output_frame            -> DecoderSession.output_frame
  jm_intel_dec_set_eof                 -> DecoderSession.set_eof
  jm_intel_dec_is_exit                 -> DecoderSession.is_exit
  jm_intel_dec_show_info               -> DecoderSession.info
  jm_intel_dec_get_stream_info         -> DecoderSession.get_stream_info
  jm_intel_dec_is_hw_support           -> DecoderSession.is_hw_support
  jm_intel_dec_set_yuv_callback        -> DecoderSession.set_yuv_callback
                                          (dead in the reference —
                                          intel_dec.cpp:370-376 stores but
                                          never calls it; live here)
  jm_nvdec_decode_frame                -> DecoderSession.decode_frame
  jm_intel_enc_default_param           -> EncoderParams()
  jm_intel_enc_encode_yuv_frame        -> EncoderSession.encode_frame
  jm_intel_enc_output_bitstream        -> EncoderSession.output_bitstream
  jm_intel_enc_get_spspps              -> EncoderSession.get_spspps
  jm_nvenc_memory_alloc_host/release   -> n/a (numpy owns buffers)
"""

from __future__ import annotations

import enum
import time
from collections import deque
from typing import Callable, List, Optional, Tuple

import numpy as np

from ..utils.metrics import counters, logger, timers

# Backpressure threshold mirrors the reference's 5 MB free-space rule
# (intel_dec/intel_dec.cpp:28,351-360) on a 10 MB ring (intel_dec.cpp:27).
INPUT_BUF_SIZE = 10 * 1024 * 1024
NEED_MORE_THRESHOLD = 5 * 1024 * 1024


class Codec(enum.IntEnum):
    H264 = 0
    HEVC = 1


class PixFmt(enum.IntEnum):
    YV12 = 0   # planar Y, V, U  (reference out_fmt 0: nv_dec.cpp repack)
    NV12 = 1   # planar Y + interleaved UV
    I420 = 2   # planar Y, U, V


def repack(Y: np.ndarray, U: np.ndarray, V: np.ndarray, fmt: PixFmt) -> bytes:
    """Crop-aware plane repack (parity: intel_dec_output_yuv_frame
    intel_dec.cpp:244-332; jm_nvdec_output_frame nv_dec.cpp:750-828)."""
    if fmt == PixFmt.I420:
        return Y.tobytes() + U.tobytes() + V.tobytes()
    if fmt == PixFmt.YV12:
        return Y.tobytes() + V.tobytes() + U.tobytes()
    if fmt == PixFmt.NV12:
        uv = np.empty((U.shape[0], U.shape[1] * 2), np.uint8)
        uv[:, 0::2] = U
        uv[:, 1::2] = V
        return Y.tobytes() + uv.tobytes()
    raise ValueError(fmt)


class _FpsMeter:
    """Info-string/fps accounting, parity with the reference's clock() diffing
    (intel_dec.cpp:951-972, nv_dec.cpp:663-683)."""

    def __init__(self):
        self.start: Optional[float] = None
        self.frames = 0
        self.bytes_in = 0

    def tick_frame(self, n=1):
        if self.start is None:
            self.start = time.monotonic()
        self.frames += n

    def fps(self) -> float:
        if not self.start or not self.frames:
            return 0.0
        dt = time.monotonic() - self.start
        return self.frames / dt if dt > 0 else 0.0


class DecoderSession:
    """Streaming decoder: bytes in (with backpressure), YUV out in display
    order, EOF drain — the reference's flagship path (SURVEY §3.1)."""

    def __init__(self, codec: Codec = Codec.H264, out_fmt: PixFmt = PixFmt.I420,
                 use_device: bool = True, use_native_parser: bool = True):
        self.codec = codec
        self.out_fmt = out_fmt
        self._buf = bytearray()
        self._scan_pos = 0
        self._frames: deque = deque()
        self._eof = False
        self._drained = False
        self._meter = _FpsMeter()
        self._yuv_callback: Optional[Callable] = None
        self._stream_info: Optional[Tuple[int, int]] = None
        self._use_device = use_device
        self._parser = None
        self._refdec = None
        self._hevc_emitted = 0
        if use_native_parser and codec == Codec.H264:
            try:
                from ..codec.h264.fastdec import FastH264Parser
                self._parser = FastH264Parser()
            except Exception:
                self._parser = None
        if self._parser is None and codec == Codec.H264:
            from ..codec.h264.refdec import H264ReferenceDecoder
            self._refdec = H264ReferenceDecoder()

    # ---- input side ----

    def need_more_data(self) -> bool:
        return self.free_buf_len() > NEED_MORE_THRESHOLD and not self._eof

    def free_buf_len(self) -> int:
        return max(0, INPUT_BUF_SIZE - len(self._buf))

    def input_data(self, data: bytes) -> int:
        """Returns bytes accepted (0 if the ring is full, like the reference
        returning 0 from intel_dec_put_input_data on overflow)."""
        if self._eof:
            return 0
        take = min(len(data), self.free_buf_len())
        self._buf += data[:take]
        self._meter.bytes_in += take
        counters.add("bytes_in", take)
        self._try_decode(flush=False)
        return take

    def set_eof(self) -> None:
        self._eof = True
        self._try_decode(flush=True)
        if self._refdec is not None and hasattr(self._refdec, "flush"):
            # drain the display-reorder buffer (B streams; parity with the
            # reference's EOF drain, intel_dec.cpp:851)
            if self.codec == Codec.HEVC:
                frames = self._refdec.flush()
                for fr in frames[self._hevc_emitted:]:
                    self._frames.append(fr)
                    self._meter.tick_frame()
                self._hevc_emitted = len(frames)
            else:
                for fr in self._refdec.flush():
                    sps = list(self._refdec.sps.values())[0]
                    self._frames.append(fr.crop(sps))
                    self._meter.tick_frame()
        self._drained = True

    # ---- output side ----

    def output_frame(self) -> Optional[bytes]:
        """Pop one frame in display order, repacked to out_fmt."""
        fr = self.get_frame()
        if fr is None:
            return None
        return repack(*fr, self.out_fmt)

    def get_frame(self):
        """Pop one frame as (Y, U, V) numpy planes. Device-decoded frames
        are materialized here — the only host<->device sync point, so host
        parse of later pictures overlaps device compute (AsyncDepth parity,
        intel_dec.cpp:36)."""
        if not self._frames:
            return None
        fr = self._frames.popleft()
        with timers.stage("d2h"):
            fr = tuple(np.asarray(p) for p in fr)
        if self._yuv_callback is not None:
            self._yuv_callback(*fr)
        return fr

    def get_frame_device(self):
        """Pop one frame WITHOUT materializing to host: device-decoded
        pictures come back as device arrays (host-decoded ones as numpy).
        The on-chip consumer path (transcode: decode -> encode without
        leaving the accelerator; the reference keeps NV12 surfaces in CUDA
        memory the same way, nv_dec.cpp:428-454 copies only on request)."""
        if not self._frames:
            return None
        fr = self._frames.popleft()
        if self._yuv_callback is not None:
            self._yuv_callback(*(np.asarray(p) for p in fr))
        return fr

    def is_exit(self) -> bool:
        return self._drained and not self._frames

    def set_yuv_callback(self, cb: Callable) -> None:
        self._yuv_callback = cb

    def decode_frame(self, data: Optional[bytes]):
        """Combined feed+pull (parity: jm_nvdec_decode_frame,
        nv_dec.cpp:481-494): push bytes (None = EOF) and pop one frame if
        ready. Returns (frame_or_None, got_frame)."""
        if data:
            self.input_data(data)
        else:
            self.set_eof()
        fr = self.get_frame()
        return fr, fr is not None

    # ---- queries ----

    def get_stream_info(self) -> Optional[Tuple[int, int]]:
        return self._stream_info

    def info(self) -> str:
        return (f"jmcodec-tpu decode | codec={self.codec.name} "
                f"frames={self._meter.frames} bytes={self._meter.bytes_in} "
                f"fps={self._meter.fps():.1f}")

    @staticmethod
    def is_hw_support() -> bool:
        """TPU-slice probe (parity: jm_intel_dec_is_hw_support)."""
        try:
            import jax
            return any(d.platform != "cpu" for d in jax.devices())
        except Exception:
            return False

    # ---- internals ----

    def _try_decode(self, flush: bool) -> None:
        """Extract complete access units from the buffer and decode them.

        A picture is complete when the NEXT picture's first slice (or EOF)
        is seen; we decode conservatively: on flush decode everything, else
        keep the last (possibly incomplete) picture's bytes buffered.
        """
        data = bytes(self._buf)
        if not data:
            return
        cut = self._last_picture_start(data) if not flush else len(data)
        if cut <= 0:
            return
        chunk, rest = data[:cut], data[cut:]
        if not chunk:
            return
        self._buf = bytearray(rest)
        self._decode_chunk(chunk)

    def _last_picture_start(self, data: bytes) -> int:
        """Byte offset of the start code of the LAST picture-initial slice
        NAL (first_mb_in_slice == 0); bytes before it form complete AUs."""
        starts = self._picture_starts(data)
        return starts[-1] if starts else -1

    def _picture_starts(self, data: bytes) -> List[int]:
        """Start-code offsets of every picture-initial slice NAL
        (H.264: first_mb_in_slice == 0; HEVC: first_slice_segment_in_pic)."""
        from ..codec.h264 import nal as NAL
        starts: List[int] = []
        for s, e in NAL.split_annexb(data):
            if self.codec == Codec.HEVC:
                typ = (data[s] >> 1) & 0x3F
                # slice NAL with first_slice_segment_in_pic_flag == 1 (the
                # first RBSP bit after the 2-byte header)
                if typ < 32 and s + 2 < len(data) and (data[s + 2] & 0x80):
                    pass
                else:
                    continue
            else:
                typ = data[s] & 0x1F
                # first_mb_in_slice == 0 <=> first ue bit pattern "1"
                if typ in (1, 5) and s + 1 < len(data) and \
                        (data[s + 1] & 0x80):
                    pass
                else:
                    continue
            sc = s - 3
            if sc > 0 and data[sc - 1] == 0:
                sc -= 1
            starts.append(sc)
        return starts

    def _decode_chunk(self, chunk: bytes) -> None:
        """Decode a chunk picture by picture so a mid-chunk fallback or a
        corrupt picture never duplicates / drops neighbours (ADVICE r1 #2)."""
        chunk = getattr(self, "_pending_prefix", b"") + chunk
        self._pending_prefix = b""
        self._cache_headers(chunk)
        starts = self._picture_starts(chunk)
        if not starts:
            # parameter sets / SEI only so far: keep them for the picture
            # that follows (they must reach the entropy parser, not just the
            # header cache)
            self._pending_prefix = chunk
            return
        cuts = [0] + starts[1:] + [len(chunk)]
        for i in range(len(cuts) - 1):
            self._decode_picture(chunk[cuts[i]:cuts[i + 1]])

    def _decode_picture(self, pic: bytes) -> None:
        """Decode one picture's bytes (leading SPS/PPS/SEI included) on the
        fast device path when possible, else the host reference path; both
        share corrupt-picture containment + keyframe resync."""
        try:
            if self._parser is not None:
                try:
                    self._decode_picture_fast(pic)
                    return
                except NotImplementedError:
                    pass  # outside fast-path scope (B, CABAC, PCM, t8...)
            if self.codec == Codec.H264:
                # host-decoded pictures don't enter the device DPB: park
                # the fast inter path until the next IDR re-anchors it
                self._fast_dirty = True
            self._decode_picture_host(pic)
        except NotImplementedError as e:
            counters.add("unsupported_pictures")
            logger.warning("dropping unsupported picture (%d bytes): %s",
                           len(pic), e)
        except (ValueError, EOFError, KeyError, IndexError) as e:
            # corrupt bitstream: drop the broken picture and resync at the
            # next keyframe (SURVEY §5.3 elastic-recovery parity)
            counters.add("corrupt_chunks")
            logger.warning("dropping corrupt picture (%d bytes): %s",
                           len(pic), e)

    def _decode_picture_fast(self, pic: bytes) -> None:
        with timers.stage("host_parse"):
            pics = self._parser.parse_annexb(pic)
        for fs, sps in pics:
            self._stream_info = (sps.width, sps.height)
            if not (self._use_device and not fs.has_pcm
                    and not fs.has_t8 and not fs.has_b):
                raise NotImplementedError("device path rejected picture")
            from ..kernels import recon_tiles as RT
            if fs.mv is None:
                with timers.stage("device_recon"):
                    Y, U, V = RT.decode_frame_symbols_device(fs)
            else:
                # P picture: MC against the device-resident DPB. Emitting
                # without a reorder buffer requires decode order == display
                # order, guaranteed by poc type 2 (B-free streams)
                if not getattr(fs, "no_reorder", False):
                    raise NotImplementedError(
                        "fast path: reordered (poc type 0) inter stream")
                if getattr(self, "_fast_dirty", False):
                    # a host-decoded picture broke the device DPB chain;
                    # stay on the host path until the next IDR
                    raise NotImplementedError("device DPB stale (fallback)")
                refs, ref_ids = self._dev_list0(fs)
                if not refs:
                    raise ValueError(
                        "reference POC missing from DPB")  # resync path
                with timers.stage("device_recon"):
                    Y, U, V = RT.decode_frame_symbols_inter(
                        fs, refs, ref_ids=ref_ids)
            counters.add("frames_device")
            if fs.is_idr:
                self._fast_dirty = False
            # mirror reference frames into the host DPB so a later host
            # fallback (e.g. an 8x8-transform picture) sees the
            # device-decoded refs (ADVICE r1 #1), and keep the padded
            # device copy for MC of later fast-path pictures
            if fs.nal_ref_idc != 0:
                # defer the host-DPB mirror: materializing Y here would
                # serialize parse and device compute; a host fallback pulls
                # the pending pictures down first (_flush_mirrors)
                self._pending_mirror = getattr(self, "_pending_mirror", [])
                self._pending_mirror.append((fs, Y, U, V))
                self._dev_dpb_add(fs, Y, U, V)
            w, h = sps.width, sps.height
            self._frames.append((Y[:h, :w], U[:h // 2, :w // 2],
                                 V[:h // 2, :w // 2]))
            self._meter.tick_frame()

    def _dev_dpb_add(self, fs, Y, U, V) -> None:
        from ..kernels import recon_tiles as RT
        import jax.numpy as jnp
        if fs.is_idr:
            self._dev_dpb = []
        if not hasattr(self, "_dev_dpb"):
            self._dev_dpb = []
        padded = RT.pad_ref_device(jnp.asarray(Y), jnp.asarray(U),
                                   jnp.asarray(V))
        self._dev_dpb.insert(0, (fs.frame_num, padded))
        del self._dev_dpb[max(1, fs.max_num_ref_frames):]

    def _dev_list0(self, fs):
        """P reference list: descending PicNum (wrap-aware, 8.2.4.2.1),
        then ref_pic_list_modification (8.2.4.3.1, short-term) — x264's
        weightp=2 relies on it for duplicate weighted references — and the
        num_ref_idx_active_l0 trim."""
        dpb = getattr(self, "_dev_dpb", [])
        max_fn = 1 << fs.log2_max_frame_num
        order = sorted(dpb, key=lambda e: (fs.frame_num - e[0]) % max_fn)
        mods = getattr(fs, "ref_mods_l0", None)
        if mods:
            lst = list(order)
            idx = 0
            pred = fs.frame_num
            for idc, val in mods:
                if idc == 2:
                    raise NotImplementedError("long-term ref modification")
                nw = (pred - (val + 1)) if idc == 0 else (pred + (val + 1))
                nw %= max_fn
                pred = nw
                pic = next((e for e in dpb if e[0] % max_fn == nw), None)
                if pic is None:
                    raise ValueError("ref modification: picture not in DPB")
                lst.insert(idx, pic)
                idx += 1
                for i in range(idx, len(lst)):
                    if lst[i] is pic:
                        del lst[i]
                        break
            order = lst
        n = getattr(fs, "num_ref_l0", 0) or len(order)
        order = order[:n]
        # picture identity per index (frame_num; duplicates share identity)
        # for the deblock bS picture comparison (8.7.2.1)
        return ([planes for (_fn, planes) in order],
                [fn for (fn, _planes) in order])

    def _host_refdec(self):
        if self._refdec is None:
            from ..codec.h264.refdec import H264ReferenceDecoder
            self._refdec = H264ReferenceDecoder()
        self._flush_mirrors()
        return self._refdec

    def _flush_mirrors(self) -> None:
        """Materialize device-decoded reference pictures into the host DPB
        (deferred from the fast path so it never blocks the pipeline)."""
        for (fs, Y, U, V) in getattr(self, "_pending_mirror", []):
            self._mirror_into_host_dpb(fs, np.asarray(Y), np.asarray(U),
                                       np.asarray(V))
        self._pending_mirror = []

    def _mirror_into_host_dpb(self, fs, Y, U, V) -> None:
        from ..codec.h264.refdec import RefPicture
        dec = self._refdec
        if dec is None:
            from ..codec.h264.refdec import H264ReferenceDecoder
            dec = self._refdec = H264ReferenceDecoder()
        if fs.is_idr:
            dec.dpb.clear()
        dec.dpb.max_refs = max(1, fs.max_num_ref_frames)
        dec.dpb.add(RefPicture(fs.frame_num,
                               np.asarray(Y, np.int32),
                               np.asarray(U, np.int32),
                               np.asarray(V, np.int32)))

    def _decode_picture_host(self, pic: bytes) -> None:
        if self.codec == Codec.HEVC:
            return self._decode_picture_hevc(pic)
        dec = self._host_refdec()
        if not dec.sps and getattr(self, "_hdr_cache", None):
            pic = b"".join(self._hdr_cache.get(t, b"") for t in (7, 8)) + pic
        out = dec.decode_annexb(pic)
        for fr in out:
            sps = list(dec.sps.values())[0]
            self._stream_info = (sps.width, sps.height)
            self._frames.append(fr.crop(sps))
            self._meter.tick_frame()

    def _hevc_device_recon(self, plan, ref_pixels):
        """device_recon hook for HevcRefDecoder: run the wavefront kernel
        on the picture plan (intra) or the MC+wavefront kernel (inter,
        against cached fractional-phase reference pyramids), return host
        coded-size planes for the DPB. The phase-pyramid cache keeps the
        reference chain device-resident across pictures."""
        import jax.numpy as jnp
        from ..kernels.hevc_tiles import decode_plan_inter, prep_hevc_ref
        R_MAX = 4  # fixed ref-stack depth: one compile per geometry
        if plan.ref_pocs and len(plan.ref_pocs) > R_MAX:
            raise NotImplementedError("more than 4 unique reference POCs")
        cache = getattr(self, "_hevc_ref_cache", None)
        if cache is None:
            cache = self._hevc_ref_cache = {}
        if plan.is_idr:
            cache.clear()  # POC resets; stale same-POC entries are wrong
        with timers.stage("device_recon"):
            # refs may already live on device (device-resident DPB planes):
            # jnp.asarray is then a no-op instead of a D2H+H2D round trip
            ju8 = lambda a: jnp.asarray(a).astype(jnp.uint8)
            for (p, y, cb, cr) in ref_pixels:
                if p not in cache:
                    cache[p] = prep_hevc_ref(ju8(y), ju8(cb), ju8(cr))
            entries = [cache[p] for (p, _, _, _) in ref_pixels]
            if not entries:
                ph2 = plan.ph + 128
                pw2 = plan.pw + 128
                entries = [(jnp.zeros((16, ph2, pw2), jnp.int16),
                            jnp.zeros((8, ph2 // 2, pw2 // 2), jnp.int16),
                            jnp.zeros((8, ph2 // 2, pw2 // 2), jnp.int16))]
            while len(entries) < R_MAX:
                entries.append(entries[0])
            stacks = tuple(jnp.stack([e[i] for e in entries])
                           for i in range(3))
            Y, U, V = decode_plan_inter(plan, stacks, coded=True)
            # this picture may serve as a reference: prep while on device
            cache[plan.poc] = prep_hevc_ref(Y, U, V)
            while len(cache) > 6:
                cache.pop(next(iter(cache)))
        counters.add("frames_device")
        # planes stay DEVICE-RESIDENT (AsyncDepth parity, and this dev
        # tunnel's D2H path is pathologically slow): the DPB/TMVP logic
        # only touches metadata, and np.asarray() materializes lazily if
        # a host fallback or the consumer needs pixels
        return Y, U, V

    def _decode_picture_hevc(self, pic: bytes) -> None:
        """HEVC decode: host entropy parse -> device recon kernel for
        supported (intra) pictures, host recon otherwise; one shared
        DPB/POC/reorder stream either way. Capability match: the
        reference's HEVC plugin path (intel_dec/intel_dec.cpp:722-741,
        nv_dec/nv_dec.h:37-46)."""
        if self._refdec is None:
            from ..codec.hevc.refdec import HevcRefDecoder
            self._refdec = HevcRefDecoder(
                device_recon=self._hevc_device_recon
                if self._use_device else None)
        dec = self._refdec
        if not dec.sps and getattr(self, "_hdr_cache", None):
            pic = b"".join(self._hdr_cache.get(t, b"")
                           for t in (32, 33, 34)) + pic
        frames = dec.decode(pic, flush=False)
        for fr in frames[self._hevc_emitted:]:
            sps = list(dec.sps.values())[0]
            self._stream_info = (sps.width, sps.height)
            self._frames.append(fr)
            self._meter.tick_frame()
        self._hevc_emitted = len(frames)

    def _cache_headers(self, chunk: bytes) -> None:
        """Remember raw parameter-set NALs so a mid-stream fallback decoder
        can be primed with parameter sets it never saw."""
        from ..codec.h264 import nal as NAL
        for s, e in NAL.split_annexb(chunk):
            if self.codec == Codec.HEVC:
                typ = (chunk[s] >> 1) & 0x3F
                if typ not in (32, 33, 34):  # VPS/SPS/PPS
                    continue
            else:
                typ = chunk[s] & 0x1F
                if typ not in (7, 8):
                    continue
            sc = s - 3
            if sc > 0 and chunk[sc - 1] == 0:
                sc -= 1
            if not hasattr(self, "_hdr_cache"):
                self._hdr_cache = {}
            self._hdr_cache[typ] = chunk[sc:e]

class EncoderParams:
    """Defaults-then-override config struct, parity with
    jm_intel_enc_default_param (intel_enc.cpp:231-249: 1080p30, 2 Mbps VBR,
    balanced preset, GOP 30, no B-frames) and nv_enc_param (jmnv_enc.h:23-53)."""

    def __init__(self, width=1920, height=1080, fps=30, bitrate_kb=2000,
                 gop_len=30, num_bframe=0, codec: Codec = Codec.H264,
                 qp: Optional[int] = None, preset: str = "balanced",
                 rc_mode: str = "vbr", vbv_buffer_ms: int = 0,
                 engine: str = "auto"):
        self.width = width
        self.height = height
        self.fps = fps
        self.bitrate_kb = bitrate_kb
        self.gop_len = gop_len
        self.num_bframe = num_bframe
        self.codec = codec
        self.qp = qp
        self.preset = preset
        # "device": TPU P-frame core (kernels/encode_tiles.py); "host":
        # pure-numpy oracle encoder; "auto": device when an accelerator
        # backs jax (the reference's HW-vs-SW session fallback,
        # intel_dec.cpp:381-414)
        self.engine = engine
        # rate control: "vbr" (QSV default, intel_enc.cpp:512), "cbr"
        # (NVENC default, nv_enc.cpp:534-535), or "cqp" (fixed qp)
        self.rc_mode = "cqp" if qp is not None else rc_mode
        self.vbv_buffer_ms = vbv_buffer_ms

    def effective_qp(self) -> int:
        if self.qp is not None:
            return self.qp
        # crude bits/pixel -> QP mapping until real rate control lands
        bpp = (self.bitrate_kb * 1000.0) / max(
            1.0, self.fps * self.width * self.height)
        import math
        qp = int(round(34 - 6 * math.log2(max(bpp, 1e-4) / 0.1)))
        return int(np.clip(qp, 10, 48))


class _HevcEncAdapter:
    """Gives the HEVC encoder the H264ReferenceEncoder session interface."""

    class _Cfg:
        def __init__(self, qp, gop_len):
            self.qp = qp
            self.gop_len = gop_len

    def __init__(self, enc):
        self._e = enc
        self.cfg = self._Cfg(enc.qp, getattr(enc, "gop_len", 1))
        self.frame_idx = 0

    def headers_annexb(self) -> bytes:
        return self._e.headers_annexb()

    def encode_frame(self, Y, U, V, qp=None) -> bytes:
        out = self._e.encode_frame(Y, U, V, qp=qp)
        self.frame_idx += 1
        return out

    def spspps(self):
        from ..codec.hevc import nal as HN
        from ..codec.hevc.refenc import write_pps, write_sps
        e = self._e
        sps = HN.write_nal_unit(HN.NAL_SPS,
                                write_sps(e.pw, e.ph, e.conf_win))
        pps = HN.write_nal_unit(HN.NAL_PPS, write_pps())
        return sps, pps


class EncoderSession:
    """YUV in -> Annex-B bitstream out with keyframe flags + SPS/PPS export
    (parity: intel_enc/nv_enc paths, SURVEY §3.2/§3.4)."""

    MAX_QUEUED = 30  # backpressure parity: in_surf_queue < 30 (intel_enc.cpp:432-440)

    def __init__(self, params: Optional[EncoderParams] = None):
        self.params = params or EncoderParams()
        engine = self.params.engine
        if engine == "auto":
            import jax
            engine = ("device" if jax.devices()[0].platform != "cpu"
                      else "host")
        if self.params.num_bframe and self.params.codec != Codec.H264:
            raise NotImplementedError("B-frames: H.264 only")
        if self.params.num_bframe and engine == "device":
            # the device engine's batched ME is P-only so far; B groups
            # run on the host engine (honest fallback, logged)
            logger.info("num_bframe>0: using the host encode engine")
            engine = "host"
        if self.params.codec == Codec.HEVC:
            # HEVC encode: IDR + P...P closed GOPs (single reference)
            from ..codec.hevc.refenc import HevcEncoder
            self._enc = _HevcEncAdapter(HevcEncoder(
                self.params.width, self.params.height,
                qp=self.params.effective_qp(),
                gop_len=max(1, self.params.gop_len)))
        else:
            from ..codec.h264.refenc import (EncoderConfig,
                                             H264ReferenceEncoder)
            # preset table parity (nv_enc.cpp:653-674 default/hp/hq GUIDs;
            # intel_enc TargetUsage 1-7): speed presets trade search range
            # and partition evaluation for throughput
            preset_knobs = {
                "fast": dict(search_range=8, inter_partitions=False),
                "hp": dict(search_range=8, inter_partitions=False),
                "balanced": dict(search_range=16, inter_partitions=True),
                "default": dict(search_range=16, inter_partitions=True),
                "quality": dict(search_range=24, inter_partitions=True),
                "hq": dict(search_range=24, inter_partitions=True),
            }
            knobs = preset_knobs.get(self.params.preset)
            if knobs is None:
                raise ValueError(f"preset {self.params.preset!r}")
            cfg = EncoderConfig(
                self.params.width, self.params.height,
                qp=self.params.effective_qp(),
                gop_len=max(1, self.params.gop_len),
                num_bframe=int(self.params.num_bframe), **knobs)
            if engine == "device":
                from ..codec.h264.devenc import DeviceH264Encoder
                self._enc = DeviceH264Encoder(cfg)
            elif engine == "host":
                self._enc = H264ReferenceEncoder(cfg)
            else:
                raise ValueError(f"engine {engine!r}")
        self._rc = None
        if self.params.rc_mode in ("cbr", "vbr"):
            from ..pipeline.ratecontrol import (RateControlConfig,
                                                RateController)
            self._rc = RateController(RateControlConfig(
                bitrate_kbps=self.params.bitrate_kb,
                fps=float(self.params.fps), mode=self.params.rc_mode,
                buffer_ms=self.params.vbv_buffer_ms,
                gop_len=max(1, self.params.gop_len),
                init_qp=self.params.effective_qp()))
        elif self.params.rc_mode != "cqp":
            raise ValueError(f"rc_mode {self.params.rc_mode!r}")
        self._out: deque = deque()
        self._eof = False
        self._meter = _FpsMeter()
        self._queued = 0
        self._headers_sent = False

    def more_data(self) -> bool:
        return len(self._out) < self.MAX_QUEUED and not self._eof

    need_more_data = more_data

    def encode_frame(self, yuv, fmt: PixFmt = PixFmt.I420) -> None:
        """Encode one frame. yuv: (Y, U, V) planes or packed bytes."""
        Y, U, V = self._unpack(yuv, fmt)
        payload = b""
        if not self._headers_sent:
            payload += self._enc.headers_annexb()
            self._headers_sent = True
        is_key = (self._enc.cfg.gop_len <= 1
                  or self._enc.frame_idx % self._enc.cfg.gop_len == 0)
        qp = None
        if self._rc is not None:
            qp = self._rc.frame_qp("I" if is_key else "P")
        nal = self._enc.encode_frame(np.asarray(Y, np.int32),
                                     np.asarray(U, np.int32),
                                     np.asarray(V, np.int32), qp=qp)
        if self._rc is not None:
            self._rc.update("I" if is_key else "P", qp, len(nal) * 8)
        if nal:
            # B groups emit several access units at once (decode order);
            # an empty return means the picture is buffered in its group
            self._out.append((payload + nal, is_key))
        elif payload:
            self._out.append((payload, is_key))
        self._meter.tick_frame()

    def output_bitstream(self) -> Optional[Tuple[bytes, bool]]:
        """Pop (bytes, is_keyframe) like jm_intel_enc_output_bitstream."""
        if not self._out:
            return None
        return self._out.popleft()

    def set_eof(self) -> None:
        if not self._eof and hasattr(self._enc, "flush"):
            tail = self._enc.flush()
            if tail:
                self._out.append((tail, False))
        self._eof = True

    def is_exit(self) -> bool:
        return self._eof and not self._out

    def get_spspps(self) -> Tuple[bytes, bytes]:
        """SPS/PPS export (parity: enc_get_spspps intel_enc.cpp:582-622,
        nvenc_get_spspps nv_enc.cpp:1168-1216)."""
        if isinstance(self._enc, _HevcEncAdapter):
            return self._enc.spspps()
        from ..codec.h264 import nal as NAL
        from ..codec.h264.params import write_pps, write_sps
        sps = NAL.write_nal_unit(3, NAL.NAL_SPS, write_sps(self._enc.sps))
        pps = NAL.write_nal_unit(3, NAL.NAL_PPS, write_pps(self._enc.pps))
        return sps, pps

    def info(self) -> str:
        return (f"jmcodec-tpu encode | {self.params.width}x{self.params.height}"
                f" qp={self._enc.cfg.qp} frames={self._meter.frames}"
                f" fps={self._meter.fps():.1f}")

    def _unpack(self, yuv, fmt: PixFmt):
        if isinstance(yuv, tuple):
            return yuv
        w, h = self.params.width, self.params.height
        buf = np.frombuffer(yuv, np.uint8)
        Y = buf[:w * h].reshape(h, w)
        if fmt == PixFmt.I420:
            U = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
            V = buf[w * h + w * h // 4:w * h * 3 // 2].reshape(h // 2, w // 2)
        elif fmt == PixFmt.YV12:
            V = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
            U = buf[w * h + w * h // 4:w * h * 3 // 2].reshape(h // 2, w // 2)
        elif fmt == PixFmt.NV12:
            uv = buf[w * h:w * h * 3 // 2].reshape(h // 2, w)
            U = uv[:, 0::2]
            V = uv[:, 1::2]
        else:
            raise ValueError(fmt)
        return Y, U, V
