#!/usr/bin/env python3
"""Compile-only bisect driver for the Pallas HEVC walk kernel.

Usage: python tools/exp_walk_compile.py [sizes] [C]
  sizes: comma list of candidate sizes to keep (default all)
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
C = int(sys.argv[2]) if len(sys.argv) > 2 else 64
max_tu = 32 if C == 64 else 16

if sizes_keep is not None:
    import jmcodec_tpu.kernels.hevc_tiles as HT
    orig = HT._zorder_candidates

    def filt(C_, mt):
        return [c for c in orig(C_, mt) if c[0] in sizes_keep]
    W._zorder_candidates = lambda C_, mt: filt(C_, mt)

B = 32
PB = min(C, max_tu)
HF, WF = 1 + C + PB, 1 + 2 * C
C4 = C // 4
HZ, WZ = 1 + C4 + PB // 4, 1 + 2 * C4

walk = W.make_pallas_walk(C, max_tu, False, True)
F = jnp.zeros((B, HF, WF), jnp.int32)
Z = jnp.zeros((B, HZ, WZ), jnp.int32)
R = jnp.zeros((B, C, C), jnp.int32)
T = jnp.zeros((B, C4, C4), jnp.int32)
M = jnp.zeros((B, C4, C4), jnp.int32)

t0 = time.time()
f = jax.jit(lambda *a: walk(*a))
out = f(F, Z, R, T, M)
out.block_until_ready()
print(f"OK compile+run {time.time()-t0:.1f}s sum={int(jnp.sum(out))}")
