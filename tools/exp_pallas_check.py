#!/usr/bin/env python3
"""TPU correctness harness for the Pallas HEVC walk: decode a SMALL x265
stream through decode_frames_hevc_batch under JMX_HEVC_WALK (default
pallas) and compare on-device against the libavcodec golden.

Usage: [JMX_HEVC_WALK=pallas] python tools/exp_pallas_check.py [WxH] [N]
Prints per-plane mismatch counts and the first mismatching 4x4 cell.
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
    size = sys.argv[1] if len(sys.argv) > 1 else "640x384"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    W, H = (int(v) for v in size.split("x"))
    import numpy as np
    import jax.numpy as jnp
    from bench import make_test_stream
    from util_oracle import oracle_decode
    from jmcodec_tpu import native
    from jmcodec_tpu.codec.hevc import nal as HN
    from jmcodec_tpu.codec.hevc.params import parse_pps, parse_sps
    from jmcodec_tpu.codec.hevc.plan import HevcFramePlan
    from jmcodec_tpu.codec.hevc.refdec import _substream_offsets
    from jmcodec_tpu.codec.hevc.slicehdr import parse_slice_header
    from jmcodec_tpu.kernels.hevc_tiles import (decode_frames_hevc_batch,
                                                resolve_walk, stack_plans)

    log(f"walk={os.environ.get('JMX_HEVC_WALK', 'unroll')} {W}x{H} N={N}")
    stream = make_test_stream(W, H, N, qp=30, codec="libx265")
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

    plans = []
    for u in slices:
        hdr = parse_slice_header(u.rbsp, u.nal_unit_type, s0, p0)
        plan = HevcFramePlan.create(s0)
        plan.record_slice(hdr, p0)
        native.hevc_fill_plan(plan, hdr, s0, p0, u.rbsp,
                              _substream_offsets(hdr, u.emu_positions))
        plans.append(plan)

    t0 = time.time()
    args = stack_plans(plans)
    out = decode_frames_hevc_batch(*args, walk=resolve_walk())
    out[0].block_until_ready()
    log(f"compile+decode: {time.time()-t0:.1f}s")

    golden, _, _ = oracle_decode(stream, suffix=".h265")
    golden = golden[:N]
    names = "YUV"
    ok = True
    for pi in range(3):
        g = jnp.asarray(np.stack([f[pi] for f in golden]))
        got = out[pi][:N, :g.shape[1], :g.shape[2]]
        neq = jnp.sum(got != g)
        n = int(neq)
        if n:
            ok = False
            bad = np.argwhere(np.asarray(got != g))
            f0, y0, x0 = bad[0]
            log(f"plane {names[pi]}: {n} mismatches; first at frame {f0} "
                f"(y={y0},x={x0}) ctb=({y0//64},{x0//64}) "
                f"got={np.asarray(got)[f0, y0, x0]} "
                f"want={np.asarray(g)[f0, y0, x0]}")
            # mismatch map at CTB granularity for frame f0
            d = np.asarray(got[f0] != g[f0])
            Hc = -(-d.shape[0] // 64)
            Wc = -(-d.shape[1] // 64)
            cm = np.zeros((Hc, Wc), int)
            for cy in range(Hc):
                for cx in range(Wc):
                    cm[cy, cx] = d[cy*64:cy*64+64, cx*64:cx*64+64].sum()
            log(f"plane {names[pi]} frame {f0} per-CTB mismatch counts:\n"
                f"{cm}")
        else:
            log(f"plane {names[pi]}: exact")
    print("BIT_EXACT" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
