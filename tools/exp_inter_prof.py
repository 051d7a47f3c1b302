#!/usr/bin/env python3
"""Attribute the HEVC inter-session cost (BENCH: 1.25 fps, stages only
account for ~10%): time each piece of the per-picture device path on the
real 16-frame IPPP bench stream — native parse, H2D of plan tensors,
decode_frame_hevc_inter with resident args, prep_hevc_ref.

Usage: python tools/exp_inter_prof.py [frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cache = os.environ.get("JMX_XLA_CACHE")
    if cache:
        import jax
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import bench_hevc_inter_session  # reuses its stream maker
    from jmcodec_tpu.api.session import Codec, DecoderSession
    from jmcodec_tpu.utils.metrics import timers

    W, H = 1920, 1080
    tag = f"/tmp/jmx_bench_hevc_inter_{W}x{H}_{N}.h265"
    if not os.path.exists(tag):
        log("run bench first to create the stream")
        sys.exit(1)
    stream = open(tag, "rb").read()

    import jmcodec_tpu.kernels.hevc_tiles as HT
    orig_dpi = HT.decode_frame_hevc_inter
    orig_prep = HT.prep_hevc_ref
    t_acc = {"kernel": 0.0, "prep": 0.0}

    # warmup run (compiles)
    def run():
        sess = DecoderSession(codec=Codec.HEVC)
        frames = []
        sess.input_data(stream)
        sess.set_eof()
        while True:
            fr = sess.get_frame_device()
            if fr is None:
                break
            frames.append(fr[0])
        jax.block_until_ready(frames)
        return len(frames)

    n = run()
    log(f"warm run: {n} frames")

    # timed pieces: wrap the kernel entry + ref prep with blocking timers
    def timed_dpi(*a, **k):
        t0 = time.time()
        out = orig_dpi(*a, **k)
        jax.block_until_ready(out)
        t_acc["kernel"] += time.time() - t0
        return out

    def timed_prep(*a, **k):
        t0 = time.time()
        out = orig_prep(*a, **k)
        jax.block_until_ready(out)
        t_acc["prep"] += time.time() - t0
        return out

    HT.decode_frame_hevc_inter = timed_dpi
    HT.prep_hevc_ref = timed_prep
    s0 = timers.snapshot()
    t0 = time.time()
    n = run()
    wall = time.time() - t0
    s1 = timers.snapshot()
    HT.decode_frame_hevc_inter = orig_dpi
    HT.prep_hevc_ref = orig_prep
    stages = {k: round((s1[k] - s0.get(k, 0)) * 1000) for k in s1
              if s1[k] - s0.get(k, 0) > 1e-3}
    log(f"total {wall*1000:.0f} ms for {n} frames = {n/wall:.2f} fps")
    log(f"kernel(block) {t_acc['kernel']*1000:.0f} ms  "
        f"prep_ref(block) {t_acc['prep']*1000:.0f} ms")
    log(f"stages {stages}")
    other = wall - t_acc["kernel"] - t_acc["prep"] - \
        (s1.get("host_parse", 0) - s0.get("host_parse", 0))
    log(f"unattributed {other*1000:.0f} ms")


if __name__ == "__main__":
    main()
