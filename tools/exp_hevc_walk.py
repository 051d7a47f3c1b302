#!/usr/bin/env python3
"""Experiment: time the HEVC device intra decode under the walk variant
selected by JMX_HEVC_WALK (unroll | switch) / JMX_HEVC_F16.

Usage: JMX_HEVC_WALK=switch python tools/exp_hevc_walk.py [frames]
Prints parse/compile/device-only timings + a checksum (must match across
variants: 802587 for the cached 16-frame 1080p bench stream).
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
    W, H = 1920, 1080
    cache = os.environ.get("JMX_XLA_CACHE")
    if cache:
        import jax
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from bench import make_test_stream
    from jmcodec_tpu import native
    from jmcodec_tpu.codec.hevc import nal as HN
    from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.hevc.plan import HevcFramePlan
    from jmcodec_tpu.codec.hevc.refdec import _substream_offsets
    from jmcodec_tpu.codec.hevc.slicehdr import parse_slice_header
    from jmcodec_tpu.kernels.hevc_tiles import (decode_frames_hevc_batch,
                                                resolve_walk, stack_plans)

    log(f"walk={os.environ.get('JMX_HEVC_WALK', 'unroll')} "
        f"f16={os.environ.get('JMX_HEVC_F16', '0')} frames={N}")
    stream = make_test_stream(W, H, 16, qp=30, codec="libx265")
    sps, pps, slices = {}, {}, []
    for u in HN.parse_nal_units(stream):
        if u.nal_unit_type == HN.NAL_SPS:
            s = parse_sps(u.rbsp)
            sps[s.sps_id] = s
        elif u.nal_unit_type == HN.NAL_PPS:
            p = parse_pps(u.rbsp)
            pps[p.pps_id] = p
        elif u.is_slice:
            slices.append(u)
    slices = slices[:N]
    p0 = pps[0]
    s0 = sps[p0.sps_id]

    t0 = time.time()
    plans = []
    for u in slices:
        hdr = parse_slice_header(u.rbsp, u.nal_unit_type, s0, p0)
        plan = HevcFramePlan.create(s0)
        plan.record_slice(hdr, p0)
        native.hevc_fill_plan(plan, hdr, s0, p0, u.rbsp,
                              _substream_offsets(hdr, u.emu_positions))
        plans.append(plan)
    log(f"parse: {time.time()-t0:.1f}s")

    t0 = time.time()
    args = stack_plans(plans)
    out = decode_frames_hevc_batch(*args, walk=resolve_walk())
    cks = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
    log(f"compile+first: {time.time()-t0:.1f}s checksum={cks}")

    for rep in range(3):
        t1 = time.time()
        out = decode_frames_hevc_batch(*args, walk=resolve_walk())
        cks = int(jnp.sum(out[0][:, ::64, ::64].astype(jnp.int32)))
        dt = time.time() - t1
        log(f"rep {rep}: device {dt*1000:.0f} ms = {N/dt:.2f} fps "
            f"(checksum {cks})")


if __name__ == "__main__":
    main()
