"""Oracle-free test-content helper importable from the driver's dryrun
(tests/util_oracle.make_frame without the tests-path dependency)."""

import numpy as np


def make_gradient_frame(W, H, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    Y = np.clip((x * 2 + y + seed * 7) % 256
                + rng.integers(-12, 13, (H, W)), 0, 255).astype(np.uint8)
    U = np.full((H // 2, W // 2), 96 + seed, np.uint8)
    V = np.full((H // 2, W // 2), 148, np.uint8)
    return Y, U, V
