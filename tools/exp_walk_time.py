#!/usr/bin/env python3
"""Per-size timing driver for the Pallas HEVC walk kernel: isolates the
per-candidate VPU cost of each TU size class (sizes filter), at bench-like
lane counts, with steady-state reps (compile excluded).

Usage: python tools/exp_walk_time.py [sizes] [B] [reps]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np

from jmcodec_tpu.kernels import hevc_walk_pallas as W

sizes_keep = None
if len(sys.argv) > 1 and sys.argv[1] != "all":
    sizes_keep = {int(s) for s in sys.argv[1].split(",")}
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
C = int(os.environ.get("JMX_C", "64"))
max_tu = 32 if C == 64 else 16

n_cands_all = len(W._zorder_candidates(C, max_tu))
if sizes_keep is not None:
    import jmcodec_tpu.kernels.hevc_tiles as HT
    orig = HT._zorder_candidates

    def filt(C_, mt):
        return [c for c in orig(C_, mt) if c[0] in sizes_keep]
    W._zorder_candidates = lambda C_, mt: filt(C_, mt)
    n_cands = len(filt(C, max_tu))
else:
    n_cands = n_cands_all

PB = min(C, max_tu)
HF, WF = 1 + C + PB, 1 + 2 * C
C4 = C // 4
HZ, WZ = 1 + C4 + PB // 4, 1 + 2 * C4

walk = W.make_pallas_walk(C, max_tu, False, True)
rng = np.random.RandomState(0)
F = jnp.asarray(rng.randint(0, 255, (B, HF, WF)).astype(np.int32))
Z = jnp.asarray(rng.randint(0, 50, (B, HZ, WZ)).astype(np.int32))
R = jnp.asarray(rng.randint(-10, 10, (B, C, C)).astype(np.int32))
# make every candidate active: tu log2 plane cycling through sizes
# (JMX_WT_INACTIVE=1 zeroes it to measure the per-candidate skip cost)
tu_np = np.zeros((B, C4, C4), np.int32)
sz = min(sizes_keep) if sizes_keep else 4
if os.environ.get("JMX_WT_INACTIVE") != "1":
    tu_np[:] = int(np.log2(sz))
T = jnp.asarray(tu_np)
M = jnp.asarray(rng.randint(0, 35, (B, C4, C4)).astype(np.int32))

# JMX_WT_STEPS wraps the walk in a lax.scan of that many steps inside ONE
# dispatch: the tunneled TPU costs ~25 ms per dispatch, so only in-program
# step counts measure the kernel itself. JMX_WT_NOKERNEL=1 replaces the
# kernel with the identity to isolate the per-step XLA glue (transposes).
steps = int(os.environ.get("JMX_WT_STEPS", "0"))
if os.environ.get("JMX_WT_NOKERNEL") == "1":
    walk = lambda F, Z, R, T, M: jnp.transpose(jnp.transpose(
        F, (1, 2, 0)).astype(jnp.int16), (2, 0, 1)).astype(F.dtype)

if steps:
    def f_raw(F, Z, R, T, M):
        def body(Fc, _):
            return walk(Fc, Z, R, T, M), ()
        out, _ = jax.lax.scan(body, F, None, length=steps)
        return out
else:
    f_raw = lambda *a: walk(*a)

t0 = time.time()
f = jax.jit(f_raw)
out = f(F, Z, R, T, M)
out.block_until_ready()
print(f"compile+first {time.time()-t0:.1f}s sum={int(jnp.sum(out))}",
      flush=True)
best = 1e9
for r in range(reps):
    t0 = time.time()
    out = f(F, Z, R, T, M)
    out.block_until_ready()
    dt = time.time() - t0
    best = min(best, dt)
per = best / max(steps, 1)
print(f"sizes={sorted(sizes_keep) if sizes_keep else 'all'} B={B} "
      f"cands={n_cands} steps={steps} best={best*1000:.2f} ms "
      f"per_step={per*1000:.3f} ms", flush=True)
