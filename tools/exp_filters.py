#!/usr/bin/env python3
"""Micro-bench the HEVC in-loop filter stages on the device: deblock luma
V pass, deblock full, SAO per plane — each as its own jitted program over
a 16-frame 1080p batch, steps repeated in-program to swamp dispatch
overhead (the tunneled TPU costs ~25 ms per dispatch).

Usage: python tools/exp_filters.py [frames] [in_prog_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import jmcodec_tpu.kernels.hevc_tiles as HT


def log(*a):
    print(*a, file=sys.stderr, flush=True)


F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
Hp, Wp = 1088, 1920
ctb_h, ctb_w = Hp // 64, Wp // 64

rng = np.random.RandomState(0)
Y = jnp.asarray(rng.randint(0, 255, (F, Hp, Wp)).astype(np.int32))
U = jnp.asarray(rng.randint(0, 255, (F, Hp // 2, Wp // 2)).astype(np.int32))
V = jnp.asarray(rng.randint(0, 255, (F, Hp // 2, Wp // 2)).astype(np.int32))
bs_ver = jnp.asarray(rng.randint(0, 3, (F, Hp // 4, Wp // 4)).astype(np.int32))
bs_hor = jnp.asarray(rng.randint(0, 3, (F, Hp // 4, Wp // 4)).astype(np.int32))
qp_y = jnp.asarray(np.full((F, Hp // 4, Wp // 4), 32, np.int32))
z = jnp.zeros((F,), jnp.int32)
sao_type = jnp.asarray(rng.randint(0, 3, (F, ctb_h, ctb_w)).astype(np.int32))
sao_off = jnp.asarray(rng.randint(-3, 3, (F, ctb_h, ctb_w, 4)).astype(np.int32))
sao_band = jnp.asarray(rng.randint(0, 31, (F, ctb_h, ctb_w)).astype(np.int32))
sao_eo = jnp.asarray(rng.randint(0, 4, (F, ctb_h, ctb_w)).astype(np.int32))


def scanify(fn):
    def wrapped(*args):
        def body(c, _):
            return fn(c, *args[1:]), ()
        out, _ = jax.lax.scan(body, args[0], None, length=STEPS)
        return out
    return jax.jit(wrapped)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    per = (best) / STEPS * 1000
    log(f"{name}: {per:.1f} ms/step (batch of {F} frames)")
    return per


# deblock luma V only
def dl_v(Y, bs, qp):
    def one(Yp, bv, q):
        ne = Yp.shape[1] // 8 - 1
        return HT._deblock_luma_v(Yp, bv[:, 2::2][:, :ne],
                                  q[:, 1::2][:, :ne], q[:, 2::2][:, :ne],
                                  0, 0)
    return jax.vmap(one)(Y, bs, qp)


# full deblock (V+H, luma+chroma)
def db_full(Y, U, V, bv, bh, qp):
    return jax.vmap(lambda y, u, v, a, b, q: HT._deblock(
        y, u, v, a, b, q, 0, 0, 0, 0))(Y, U, V, bv, bh, qp)


def db_carry(carry, bv, bh, qp):
    Y, U, V = carry
    return db_full(Y, U, V, bv, bh, qp)


def sao_y(Y, t, o, b, e):
    return jax.vmap(lambda p, tt, oo, bb, ee: HT._sao_plane(
        p, tt, oo, bb, ee, 6, 1920, 1080))(Y, t, o, b, e)


log(f"device: {jax.devices()[0]}")
timeit("deblock_luma_v", scanify(dl_v), Y, bs_ver, qp_y)
timeit("deblock_full", scanify(db_carry), (Y, U, V), bs_ver, bs_hor, qp_y)
timeit("sao_luma", scanify(sao_y), Y, sao_type, sao_off, sao_band, sao_eo)
