#!/usr/bin/env python3
"""Scaling measurement harness (BASELINE: ">=80% frames/s scaling"):
decode the SAME work at 1..N devices (frame-parallel dp over the real
H.264 wavefront kernel) and report fps + efficiency. On the dev
environment the mesh is N virtual CPU devices; on a pod the same code
measures real chips, and JMX_COORD/JMX_NPROC bring up multi-host via
jax.distributed (parallel/distributed.init_from_env).

Writes SCALING_r{N}.json when --out is given.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", default="320x192")
    ap.add_argument("--qp", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    dev_list = [int(d) for d in args.devices.split(",")]
    if os.environ.get("JMX_SCALING_TPU") != "1":
        # dev environment: one real chip; measure on a virtual CPU mesh
        # (identical code path; on a pod set JMX_SCALING_TPU=1)
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{max(dev_list)}").strip()
    import jax

    if os.environ.get("JMX_SCALING_TPU") != "1":
        # the env var alone does not win over a registered TPU plugin
        # (tests/conftest.py note): force the config knob too
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", max(dev_list))
        except Exception:
            pass

    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    from jmcodec_tpu.codec.h264.refenc import encode_stream
    from jmcodec_tpu.parallel.distributed import (init_from_env,
                                                  measure_decode_scaling)
    from util_oracle_free import make_gradient_frame

    boot = init_from_env()
    W, H = (int(v) for v in args.size.split("x"))
    frames = [make_gradient_frame(W, H, seed=i) for i in range(args.frames)]
    stream, _ = encode_stream(frames, W, H, qp=args.qp)
    fss = [fs for fs, _ in FastH264Parser().parse_annexb(stream)]

    res = measure_decode_scaling(fss, dev_list)
    cores = os.cpu_count() or 1
    report = {
        "metric": "h264_decode_frame_parallel_scaling",
        "size": args.size, "frames": args.frames,
        "platform": jax.devices()[0].platform,
        "physical_cores": cores,
        "bringup": boot, **res,
        "note": ("frame-parallel dp over the real wavefront kernel; CPU "
                 "virtual mesh in this environment (single real chip) — "
                 "the code path is identical on a pod slice. NOTE: all "
                 f"virtual devices share {cores} physical core(s), so "
                 "efficiency here is bounded by core oversubscription "
                 "(max true speedup = cores), not by the sharding or "
                 "collectives; the pod-slice number requires real chips"),
    }
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
