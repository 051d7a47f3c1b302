"""The HEVC TU-walk variants (unroll / switch / pallas) are bit-identical:
same candidate order, same arithmetic (ADVICE r3: the knobs were untested).
Runs the chroma-size walk (84 candidates) on synthetic state — small enough
for the CPU interpreter."""

import numpy as np
import pytest


def _synth_state(C=32, max_tu=16, B=4, seed=0):
    import jax.numpy as jnp
    from jmcodec_tpu.codec.hevc.plan import ZIDX_NONE
    rng = np.random.default_rng(seed)
    C4 = C // 4
    PB = min(C, max_tu)
    skew = 2
    WF = 1 + skew * C
    WZ = 1 + skew * C4
    F = np.zeros((B, 1 + C + PB, WF), np.int32)
    F[:, 0, :] = rng.integers(0, 256, (B, WF))       # top refs
    F[:, :, 0] = rng.integers(0, 256, (B, 1 + C + PB))
    Z = np.full((B, 1 + C4 + PB // 4, WZ), ZIDX_NONE, np.int32)
    # interior zidx: raster-ish increasing => plausible availability
    zi = np.arange(C4 * C4).reshape(C4, C4)
    Z[:, 1:1 + C4, 1:1 + C4] = zi
    Z[:, 0, :] = -1                                   # top row available
    Z[:, :, 0] = -1
    resid = rng.integers(-20, 21, (B, C, C)).astype(np.int32)
    # random TU partition per lane: mark whole quadrants at random sizes
    tu = np.zeros((B, C4, C4), np.int32)
    for b in range(B):
        for qy in range(2):
            for qx in range(2):
                log2 = int(rng.integers(2, 5))
                n4 = (1 << log2) // 4
                for yy in range(qy * C4 // 2, (qy + 1) * C4 // 2, n4):
                    for xx in range(qx * C4 // 2, (qx + 1) * C4 // 2, n4):
                        tu[b, yy, xx] = log2
    mode = rng.integers(0, 35, (B, C4, C4)).astype(np.int32)
    j = jnp.asarray
    return j(F), j(Z), j(resid), j(tu), j(mode)


@pytest.mark.parametrize("variant", ["switch", "pallas"])
def test_walk_variants_match_unroll(variant):
    from jmcodec_tpu.kernels import hevc_tiles as HT
    from jmcodec_tpu.kernels.hevc_walk_pallas import make_pallas_walk

    C, max_tu = 32, 16
    F, Z, resid, tu, mode = _synth_state(C, max_tu)
    ref_walk = HT._make_walk(C, max_tu, is_chroma=True, strong=False)
    want = np.asarray(ref_walk(F, Z, resid, tu, mode))
    if variant == "switch":
        got_walk = HT._make_walk_switch(C, max_tu, is_chroma=True,
                                        strong=False)
    else:
        got_walk = make_pallas_walk(C, max_tu, is_chroma=True, strong=False)
    got = np.asarray(got_walk(F, Z, resid, tu, mode))
    assert np.array_equal(got, want)
