"""Pallas fused dequant+IDCT vs the numpy oracle (interpret mode on CPU;
compiled on TPU when available)."""

import numpy as np
import pytest

from jmcodec_tpu.kernels import pallas_idct as PK
from jmcodec_tpu.ops import transform as T

pytestmark = pytest.mark.skipif(not PK.HAVE_PALLAS, reason="no pallas")

rng = np.random.default_rng(31)


@pytest.mark.parametrize("qp", [0, 11, 24, 37, 51])
def test_matches_numpy_oracle(qp):
    N = 700  # non-multiple of BLOCK exercises padding
    c = rng.integers(-200, 200, (N, 4, 4)).astype(np.int32)
    qps = np.full(N, qp, np.int32)
    want = T.np_inverse_transform_4x4(T.np_dequant_4x4(c, qp))
    got = np.asarray(PK.dequant_idct_blocks(c, qps, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_mixed_qp_per_block():
    N = 512
    c = rng.integers(-64, 64, (N, 4, 4)).astype(np.int32)
    qps = rng.integers(0, 52, N).astype(np.int32)
    got = np.asarray(PK.dequant_idct_blocks(c, qps, interpret=True))
    for k in range(0, N, 37):
        want = T.np_inverse_transform_4x4(T.np_dequant_4x4(c[k:k + 1], int(qps[k])))
        np.testing.assert_array_equal(got[k:k + 1], want)
