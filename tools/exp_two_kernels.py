#!/usr/bin/env python3
"""Two-kernel interleave driver (historical: the r4 crash suspect).
r5 bisect exonerated the interleave — at bench shapes it runs stable; the
real TPU-worker fault triggers were compact int8/int16 operands sharing a
program with the Pallas kernels (fixed: _widen_i32 pre-pass) and the SAO
scalar gather. Kept as a standalone stress/perf driver.
Usage: exp_two_kernels.py [B64] [B32] [steps] [reps]
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np

from jmcodec_tpu.kernels import hevc_walk_pallas as W

B64 = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B32 = int(sys.argv[2]) if len(sys.argv) > 2 else 384
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 94
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5


def state(C, max_tu, B, seed):
    rng = np.random.RandomState(seed)
    PB = min(C, max_tu)
    HF, WF = 1 + C + PB, 1 + 2 * C
    C4 = C // 4
    HZ, WZ = 1 + C4 + PB // 4, 1 + 2 * C4
    j = jnp.asarray
    F = j(rng.randint(0, 255, (B, HF, WF)).astype(np.int32))
    Z = j(rng.randint(0, 50, (B, HZ, WZ)).astype(np.int32))
    R = j(rng.randint(-10, 10, (B, C, C)).astype(np.int32))
    tu = np.zeros((B, C4, C4), np.int32)
    tu[:] = 2
    M = j(rng.randint(0, 35, (B, C4, C4)).astype(np.int32))
    return F, Z, R, j(tu), M


w64 = W.make_pallas_walk(64, 32, False, True)
w32 = W.make_pallas_walk(32, 16, True, False)
F1, Z1, R1, T1, M1 = state(64, 32, B64, 0)
F2, Z2, R2, T2, M2 = state(32, 16, B32, 1)


# big scanned xs/ys like the real decode (per-step residual slices in,
# per-step recon tiles out) — JMX_TK_XS=0 reverts to the closure version
USE_XS = os.environ.get("JMX_TK_XS", "1") == "1"
rng = np.random.RandomState(7)
R1t = jnp.asarray(rng.randint(-10, 10, (steps, B64, 64, 64)).astype(np.int32))
R2t = jnp.asarray(rng.randint(-10, 10, (steps, B32, 32, 32)).astype(np.int32))


@jax.jit
def prog(F1, F2, R1t, R2t):
    def body(carry, xs):
        a, b = carry
        if USE_XS:
            r1, r2 = xs
        else:
            r1, r2 = R1, R2
        a = w64(a, Z1, r1, T1, M1)
        b = w32(b, Z2, r2, T2, M2)
        return (a, b), (a[:, 1:65, 1:65], b[:, 1:33, 1:33])
    (a, b), ys = jax.lax.scan(body, (F1, F2),
                              (R1t, R2t) if USE_XS else None, length=steps)
    return a, b, ys[0], ys[1]


t0 = time.time()
a, b, y1, y2 = prog(F1, F2, R1t, R2t)
s = int(jnp.sum(a)) + int(jnp.sum(b)) + int(jnp.sum(y1[::7])) \
    + int(jnp.sum(y2[::7]))
print(f"compile+first {time.time()-t0:.1f}s sum={s}", flush=True)
for r in range(reps):
    t0 = time.time()
    a, b, y1, y2 = prog(F1, F2, R1t, R2t)
    s = int(jnp.sum(a)) + int(jnp.sum(b)) + int(jnp.sum(y1[::7])) \
        + int(jnp.sum(y2[::7]))
    print(f"rep {r}: {(time.time()-t0)*1000:.0f} ms sum={s}", flush=True)
