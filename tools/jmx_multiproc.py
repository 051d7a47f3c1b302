#!/usr/bin/env python3
"""Multi-PROCESS GOP-DP run (VERDICT r4 #8): two OS processes bring up
`jax.distributed.initialize` (parallel/distributed.init_from_env), share
one on-disk TranscodeManifest, claim GOPs work-stealing style, decode
them, and prove the cross-process boundary with a psum over the global
mesh — the DCN stand-in this single-host environment allows. The same
code brings up real multi-host pods (JMX_COORD across machines).

Parent:  python tools/jmx_multiproc.py [--nproc 2] [--out FILE]
Child:   (spawned with JMX_PROC_ID / JMX_COORD / JMX_NPROC set)
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def child(outdir: str) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jmcodec_tpu.parallel.distributed import init_from_env
    boot = init_from_env()
    pid = boot["process_id"]

    # cross-process collective over the global mesh: each process
    # contributes its claimed-frame count; every process must see the sum
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    import numpy as np
    from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder
    from jmcodec_tpu.pipeline.gop import TranscodeManifest

    man = TranscodeManifest.load(outdir)
    stream = open(man.input_path, "rb").read()
    # every GOP chunk needs the parameter sets: take SPS/PPS NALs off the
    # stream head (GOP 0's byte range already includes them; re-feeding is
    # harmless)
    from jmcodec_tpu.codec.h264 import nal as NAL
    head = b""
    for s_, e_ in NAL.split_annexb(stream):
        typ = stream[s_] & 0x1F
        if typ in (7, 8):
            sc = s_ - 3
            if sc > 0 and stream[sc - 1] == 0:
                sc -= 1
            head += stream[sc:e_]
        elif typ in (1, 5):
            break
    t0 = time.time()
    frames = 0
    gops = []
    while True:
        job = man.claim(f"proc{pid}")
        if job is None:
            break
        dec = H264ReferenceDecoder()
        out = dec.decode_annexb(head + stream[job.byte_start:job.byte_end])
        frames += len(out)
        gops.append(job.index)
        man.complete(job.index, f"mem://proc{pid}/{job.index}")
    dt = time.time() - t0

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("dp",))
    contrib = jnp.zeros((len(devs),), jnp.int32)
    contrib = contrib.at[jax.process_index() * len(jax.local_devices())].set(
        frames)

    @jax.jit
    def total(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
            in_specs=P("dp"), out_specs=P())(x)

    global_frames = int(total(contrib)[0])
    rep = {"process_id": pid, "processes": boot["processes"],
           "global_devices": boot["devices"],
           "local_devices": boot["local_devices"],
           "frames_local": frames, "gops_local": gops,
           "frames_global_psum": global_frames, "seconds": round(dt, 3)}
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(rep, f)
    print(json.dumps(rep), flush=True)


def main() -> None:
    if os.environ.get("JMX_PROC_ID") is not None and \
            os.environ.get("JMX_MP_CHILD") == "1":
        child(sys.argv[1])
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--gops", type=int, default=8)
    ap.add_argument("--frames-per-gop", type=int, default=3)
    ap.add_argument("--size", default="192x96")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from jmcodec_tpu.codec.h264.refenc import encode_stream
    from jmcodec_tpu.pipeline.gop import TranscodeManifest
    from util_oracle_free import make_gradient_frame

    W, H = (int(v) for v in args.size.split("x"))
    # encode_stream emits IDR-only pictures: every frame is a closed
    # one-picture GOP, which is exactly the unit the manifest splits on
    frames = [make_gradient_frame(W, H, seed=i)
              for i in range(args.gops * args.frames_per_gop)]
    stream, _ = encode_stream(frames, W, H, qp=30)
    outdir = "/tmp/jmx_multiproc"
    os.makedirs(outdir, exist_ok=True)
    for f in os.listdir(outdir):
        os.unlink(os.path.join(outdir, f))
    inp = os.path.join(outdir, "in.h264")
    open(inp, "wb").write(stream)
    man = TranscodeManifest.create(inp, outdir)
    man.save()
    n_jobs = len(man.jobs)

    procs = []
    t0 = time.time()
    for i in range(args.nproc):
        env = dict(os.environ,
                   JMX_COORD="127.0.0.1:29571", JMX_NPROC=str(args.nproc),
                   JMX_PROC_ID=str(i), JMX_MP_CHILD="1",
                   JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    rc = [p.wait(timeout=600) for p in procs]
    wall = time.time() - t0
    for p, r in zip(procs, rc):
        if r != 0:
            print(p.stdout.read().decode(errors="replace")[-2000:],
                  file=sys.stderr)
    reports = []
    for i in range(args.nproc):
        with open(os.path.join(outdir, f"proc{i}.json")) as f:
            reports.append(json.load(f))
    total_frames = args.gops * args.frames_per_gop
    ok = (all(r == 0 for r in rc)
          and all(r["frames_global_psum"] == total_frames for r in reports)
          and sum(r["frames_local"] for r in reports) == total_frames
          and all(r["processes"] == args.nproc for r in reports)
          and len(set(g for r in reports for g in r["gops_local"]))
          == n_jobs)
    out = {
        "metric": "multiprocess_gop_dp",
        "ok": ok, "nproc": args.nproc, "gops": n_jobs,
        "total_frames": total_frames, "wall_s": round(wall, 2),
        "per_process": reports,
        "note": ("jax.distributed.initialize across OS processes on one "
                 "host (the DCN stand-in this environment allows): shared "
                 "manifest GOP claims + a cross-process psum over the "
                 "global dp mesh agreeing on the frame total"),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
