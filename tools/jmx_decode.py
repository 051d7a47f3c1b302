#!/usr/bin/env python3
"""Decode an Annex-B elementary stream to raw YUV.

Parity with the reference decode test apps (test_intel_dec.cpp /
test_nv_dec.cpp): streaming read loop with backpressure, frame counting, and
the fps info line at EOF.

Usage: jmx_decode.py in.h264 out.i420 [--codec h264|hevc]
                                      [--fmt i420|nv12|yv12] [--host]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from jmcodec_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402
honor_jax_platforms_env()

from jmcodec_tpu.api.session import Codec, DecoderSession, PixFmt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--fmt", default="i420", choices=["i420", "nv12", "yv12"])
    ap.add_argument("--codec", default=None, choices=["h264", "hevc"],
                    help="default: by input extension (.h265/.hevc -> hevc)")
    ap.add_argument("--host", action="store_true",
                    help="force host (numpy) recon path")
    args = ap.parse_args()

    codec = args.codec
    if codec is None:
        codec = "hevc" if args.input.lower().endswith(
            (".h265", ".hevc", ".265")) else "h264"
    fmt = {"i420": PixFmt.I420, "nv12": PixFmt.NV12, "yv12": PixFmt.YV12}[args.fmt]
    dec = DecoderSession(Codec.HEVC if codec == "hevc" else Codec.H264,
                         fmt, use_device=not args.host)
    n = 0
    with open(args.input, "rb") as fi, open(args.output, "wb") as fo:
        while not dec.is_exit():
            if dec.need_more_data():
                chunk = fi.read(dec.free_buf_len())
                if chunk:
                    dec.input_data(chunk)
                else:
                    dec.set_eof()
            frame = dec.output_frame()
            if frame is not None:
                fo.write(frame)
                n += 1
    print(dec.info())
    info = dec.get_stream_info()
    if info:
        print(f"stream: {info[0]}x{info[1]}, {n} frames")


if __name__ == "__main__":
    main()
