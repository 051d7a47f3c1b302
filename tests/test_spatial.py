"""Spatial (MB-row) sharding of the REAL wavefront decode (SURVEY §2.3 ③):
one frame's rows banded over the sp axis, ppermute halo exchange for the
wavefront carry AND the deblock row dependency; 8-dev == 1-dev bit-exact."""

import numpy as np
import pytest

from jmcodec_tpu.codec.h264.refenc import encode_stream
from jmcodec_tpu.parallel.mesh import ShardingConfig, build_mesh
from jmcodec_tpu.parallel.spatial import decode_frame_rows_sharded

from util_oracle import make_frame


def _symbols(W, H, n=1, qp=30):
    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    frames = [make_frame(W, H, seed=i) for i in range(n)]
    stream, recons = encode_stream(frames, W, H, qp=qp)
    parser = FastH264Parser()
    return [fs for fs, _ in parser.parse_annexb(stream)], recons


def test_rows_sharded_bit_exact():
    import jax
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest provides an 8-device CPU mesh"
    # sp over all 8 devices: 8 row bands; 128 px tall = 8 MB rows, 1 per dev
    cfg = ShardingConfig(dp=1, sp=8)
    mesh = build_mesh(cfg)
    fss, recons = _symbols(96, 128, n=2)
    for fs, (ry, ru, rv) in zip(fss, recons):
        Y, U, V = decode_frame_rows_sharded(fs, mesh=mesh, cfg=cfg)
        h, w = ry.shape
        assert np.array_equal(Y[:h, :w], ry)
        assert np.array_equal(U[:h // 2, :w // 2], ru)
        assert np.array_equal(V[:h // 2, :w // 2], rv)


def test_rows_sharded_sp2_tall():
    cfg = ShardingConfig(dp=1, sp=2)
    mesh = build_mesh(cfg)
    fss, recons = _symbols(48, 64, n=1, qp=24)
    Y, _, _ = decode_frame_rows_sharded(fss[0], mesh=mesh, cfg=cfg)
    h, w = recons[0][0].shape
    assert np.array_equal(Y[:h, :w], recons[0][0])
