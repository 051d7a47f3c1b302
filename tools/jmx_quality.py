#!/usr/bin/env python3
"""Encode-quality harness: PSNR/bitrate of the jmcodec-tpu encoder vs x264 at
matched QP (BASELINE.md: encoder quality vs the reference operating points).

Usage: jmx_quality.py [--size WxH] [--frames N] [--qps 24,28,32] [--gop N]
Prints a table + JSON summary.
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from jmcodec_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402
honor_jax_platforms_env()
sys.path.insert(0, os.path.join(__file__.rsplit("/", 2)[0], "tests"))

import numpy as np  # noqa: E402


def psnr(a, b):
    mse = ((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean()
    return float("inf") if mse == 0 else 10 * math.log10(255.0 ** 2 / mse)


def run_point(frames, W, H, qp, gop):
    from util_oracle import oracle_decode, oracle_encode
    from jmcodec_tpu.codec.h264.refenc import EncoderConfig, H264ReferenceEncoder

    # ours
    enc = H264ReferenceEncoder(EncoderConfig(W, H, qp=qp, gop_len=gop))
    ours_stream = enc.headers_annexb()
    ours_psnr = []
    for fr in frames:
        ours_stream += enc.encode_frame(*[np.asarray(p, np.int32) for p in fr])
        ours_psnr.append(psnr(enc.recon_cropped()[0], fr[0]))
    # x264 at the same qp / gop
    x_stream = oracle_encode(frames, W, H, qp=qp, gop=gop)
    x_dec, _, _ = oracle_decode(x_stream)
    x_psnr = [psnr(x_dec[i][0], frames[i][0]) for i in range(len(frames))]
    return {
        "qp": qp,
        "ours_bits": len(ours_stream) * 8,
        "x264_bits": len(x_stream) * 8,
        "ours_psnr_y": round(sum(ours_psnr) / len(ours_psnr), 2),
        "x264_psnr_y": round(sum(x_psnr) / len(x_psnr), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="320x240")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--qps", default="22,28,34")
    ap.add_argument("--gop", type=int, default=5)
    args = ap.parse_args()
    W, H = map(int, args.size.split("x"))

    from test_inter_decode import moving_frames
    frames = moving_frames(W, H, args.frames, step=(2, 3))
    rows = []
    for qp in map(int, args.qps.split(",")):
        r = run_point(frames, W, H, qp, args.gop)
        rows.append(r)
        print(f"qp={qp}: ours {r['ours_psnr_y']:.2f} dB @ {r['ours_bits']/1000:.0f} kbit | "
              f"x264 {r['x264_psnr_y']:.2f} dB @ {r['x264_bits']/1000:.0f} kbit | "
              f"bit ratio {r['ours_bits']/r['x264_bits']:.2f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
