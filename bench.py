#!/usr/bin/env python3
"""Headline benchmark: 1080p H.264 intra decode throughput per chip.

Pipeline measured end-to-end: host entropy parse (native C++ CAVLC ->
symbol planes, threaded) + device reconstruction (wavefront intra + deblock,
frame-batched) on whatever accelerator jax exposes (TPU under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/60}
(baseline: BASELINE.md target of 60 fps/chip bit-exact 1080p decode).
"""

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_test_stream(W=1920, H=1080, n_frames=8, qp=30):
    """x264 intra stream via the conformance oracle tool (test data only)."""
    cache = f"/tmp/jmx_bench_{W}x{H}_{n_frames}_{qp}.h264"
    if os.path.exists(cache):
        return open(cache, "rb").read()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from util_oracle import have_oracle, make_frame, oracle_encode
    if not have_oracle():
        raise RuntimeError("no oracle to generate bench stream")
    frames = [make_frame(W, H, seed=i, kind="gradient_noise")
              for i in range(n_frames)]
    data = oracle_encode(frames, W, H, qp=qp, gop=1)
    open(cache, "wb").write(data)
    return data


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    W, H, N = 1920, 1080, int(os.environ.get("JMX_BENCH_FRAMES", "16"))
    stream = make_test_stream(W, H, N)
    log(f"bench stream: {len(stream)/1024:.0f} KB, {N} frames {W}x{H}")

    import jax
    from jmcodec_tpu.codec.h264 import nal as NAL
    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    from jmcodec_tpu.kernels.recon_tiles import decode_frames_batch
    from jmcodec_tpu.kernels.recon import stack_symbols

    platform = jax.devices()[0].platform
    log(f"device: {jax.devices()[0]} ({platform})")

    # split stream into per-picture chunks for threaded host parse
    units = list(NAL.split_annexb(stream))
    starts = []
    for s, e in units:
        typ = stream[s] & 0x1F
        if typ in (1, 5) and (stream[s + 1] & 0x80):
            sc = s - 3
            if sc > 0 and stream[sc - 1] == 0:
                sc -= 1
            starts.append(sc)
    starts.append(len(stream))
    head = stream[:starts[0]]
    chunks = [head + stream[starts[i]:starts[i + 1]]
              for i in range(len(starts) - 1)]
    log(f"{len(chunks)} pictures")

    parser = FastH264Parser()
    parser.parse_annexb(chunks[0])  # prime SPS/PPS

    def parse_one(c):
        return parser.parse_annexb(c)[0]

    # warmup: parse all & compile the batched device program
    fss = [parse_one(c) for c in chunks]
    mbh, mbw = fss[0][0].mb_height, fss[0][0].mb_width
    args = stack_symbols([f for f, _ in fss])
    t0 = time.time()
    import jax.numpy as jnp
    out = decode_frames_batch(mbh, mbw, *args, deblock=True)
    # the checksum reduce is part of the timed loop: compile it now too
    _ = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
    log(f"compile+first batch: {time.time()-t0:.1f}s")

    # timed runs: host parse (threads) + transfer + device decode. Completion
    # is forced by fetching an on-device checksum (block_until_ready can
    # return early on tunneled backends). Decoded frames stay device-resident
    # (the TPU-native pipeline consumes them on-device; fetching frames over
    # the tunnel is not part of the decode metric).
    import jax.numpy as jnp
    pool = ThreadPoolExecutor(max_workers=os.cpu_count() or 2)
    best = 0.0
    best_compute = 0.0
    for rep in range(3):
        t0 = time.time()
        fss = list(pool.map(parse_one, chunks))
        args = stack_symbols([f for f, _ in fss])
        out = decode_frames_batch(mbh, mbw, *args, deblock=True)
        checksum = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
        dt = time.time() - t0
        fps = len(chunks) / dt
        # compute-only: args already resident
        t1 = time.time()
        out = decode_frames_batch(mbh, mbw, *args, deblock=True)
        checksum = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
        dtc = time.time() - t1
        cfps = len(chunks) / dtc
        log(f"rep {rep}: e2e {dt*1000:.0f} ms = {fps:.2f} fps | device "
            f"{dtc*1000:.0f} ms = {cfps:.2f} fps (checksum {checksum})")
        best = max(best, fps)
        best_compute = max(best_compute, cfps)

    # sanity: output must match the independent reference decoder (libavcodec
    # oracle) bit-exactly on every frame. Compare ON DEVICE (device->host
    # fetches are pathologically slow through the tunnel; host->device of the
    # golden frames is cheap by comparison).
    from util_oracle import oracle_decode
    golden, _, _ = oracle_decode(stream)
    gY = jnp.asarray(np.stack([g[0] for g in golden]))
    exact = bool(jnp.all(out[0][:len(golden), :H, :W] == gY))
    log(f"bit-exact vs reference decoder: {exact}")

    result = {
        "metric": "h264_1080p_intra_decode_fps_per_chip",
        "value": round(best, 2),
        "unit": "fps",
        "vs_baseline": round(best / 60.0, 3),
        "device_compute_fps": round(best_compute, 2),
        "bit_exact": exact,
        "platform": platform,
        "note": ("e2e includes host CAVLC parse + H2D transfer; this dev "
                 "environment tunnels the TPU at ~60 MB/s H2D which bounds "
                 "e2e; device_compute_fps is the on-chip decode rate"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
