#!/usr/bin/env python3
"""Transcode an H.264 elementary stream (decode -> optional rescale -> encode)
with resumable per-GOP jobs.

The reference listed transcode as an unimplemented TODO (README.md:177-188);
here it is a first-class pipeline: GOPs are independent work units recorded in
a manifest (crash-safe resume; stale jobs reassigned).

Usage: jmx_transcode.py in.h264 out_dir [--qp N] [--scale 2] [--worker NAME]
"""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from jmcodec_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402
honor_jax_platforms_env()

import numpy as np  # noqa: E402

from jmcodec_tpu.api.session import (DecoderSession, EncoderParams,  # noqa
                                     EncoderSession)
from jmcodec_tpu.pipeline.gop import TranscodeManifest  # noqa: E402


def downscale2(Y, U, V):
    def ds(P):
        P = P.astype(np.int32)
        return ((P[0::2, 0::2] + P[0::2, 1::2] + P[1::2, 0::2]
                 + P[1::2, 1::2] + 2) >> 2).astype(np.uint8)
    return ds(Y), ds(U), ds(V)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--qp", type=int, default=28)
    ap.add_argument("--scale", type=int, default=1, choices=[1, 2])
    ap.add_argument("--gop", type=int, default=0,
                    help="re-encode GOP length (0 = all-intra)")
    ap.add_argument("--worker", default=f"worker-{os.getpid()}")
    args = ap.parse_args()

    data = open(args.input, "rb").read()
    if os.path.exists(os.path.join(args.out_dir, "manifest.json")):
        manifest = TranscodeManifest.load(args.out_dir)
        print(f"resuming: {manifest.done()} done, {manifest.pending()} pending")
    else:
        manifest = TranscodeManifest.create(args.input, args.out_dir,
                                            stream=data)
        manifest.save()
        print(f"created manifest with {len(manifest.jobs)} GOPs")

    # SPS/PPS NALs prefix every standalone GOP chunk (split_gops attaches the
    # stream-leading headers to GOP 0, so extract them explicitly)
    from jmcodec_tpu.codec.h264 import nal as NAL
    head = b""
    for s, e in NAL.split_annexb(data):
        typ = data[s] & 0x1F
        if typ in (7, 8):
            sc = s - 3
            if sc > 0 and data[sc - 1] == 0:
                sc -= 1
            head += data[sc:e]
        if typ in (1, 5):
            break

    while True:
        job = manifest.claim(args.worker)
        if job is None:
            break
        try:
            chunk = head + data[job.byte_start:job.byte_end]
            dec = DecoderSession()
            frames = []
            # feed-with-drain loop: input_data may partially accept when the
            # chunk exceeds the 10MB ring (the reference grows its buffer,
            # intel_dec.cpp dec_extend_bitstream — here we drain frames
            # between feeds instead of dropping input)
            fed = 0
            while fed < len(chunk):
                take = dec.input_data(chunk[fed:])
                fed += take
                while True:
                    fr = dec.get_frame()
                    if fr is None:
                        break
                    frames.append(fr)
                if take == 0 and not dec._frames:
                    raise RuntimeError("decoder stalled with full input ring")
            dec.set_eof()
            while True:
                fr = dec.get_frame()
                if fr is None:
                    break
                frames.append(fr)
            if not frames:
                raise RuntimeError("GOP decoded to zero frames")
            if args.scale == 2:
                frames = [downscale2(*f) for f in frames]
            H, W = frames[0][0].shape
            enc = EncoderSession(EncoderParams(
                width=W, height=H, qp=args.qp,
                gop_len=args.gop if args.gop else len(frames)))
            seg_path = os.path.join(args.out_dir, f"seg{job.index:05d}.h264")
            with open(seg_path, "wb") as f:
                for fr in frames:
                    enc.encode_frame(fr)
                    while True:
                        pkt = enc.output_bitstream()
                        if pkt is None:
                            break
                        f.write(pkt[0])
            manifest.complete(job.index, os.path.basename(seg_path))
            print(f"GOP {job.index}: {len(frames)} frames -> {seg_path}")
        except Exception as e:  # noqa: BLE001
            manifest.fail(job.index)
            print(f"GOP {job.index} FAILED: {e}", file=sys.stderr)

    # concatenate completed segments in order
    if manifest.pending() == 0:
        out_path = os.path.join(args.out_dir, "out.h264")
        with open(out_path, "wb") as f:
            for j in manifest.jobs:
                f.write(open(os.path.join(args.out_dir, j.output), "rb").read())
        print(f"transcode complete: {out_path}")


if __name__ == "__main__":
    main()
