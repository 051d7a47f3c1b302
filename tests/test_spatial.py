"""Spatial (MB-row) sharding of the REAL wavefront decode (SURVEY §2.3 ③):
one frame's rows banded over the sp axis, ppermute halo exchange for the
wavefront carry AND the deblock row dependency; 8-dev == 1-dev bit-exact."""

import jax.numpy as jnp
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


def test_rows_sharded_inter_bit_exact():
    """P frames row-banded over sp: MC reads its reference band + MC_PAD
    halo rows ppermuted from neighbour shards (§2.3 ④ reference-window
    exchange) — bit-exact vs the unsharded inter kernel AND the oracle."""
    import jax

    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    from jmcodec_tpu.kernels import recon_tiles as RT
    from jmcodec_tpu.parallel.spatial import decode_frame_rows_sharded_inter
    from util_oracle import have_oracle, oracle_decode, oracle_encode

    if not have_oracle():
        pytest.skip("oracle unavailable")
    W, H, N = 96, 128, 4
    base = make_frame(W + 32, H + 32, seed=3)
    frames = []
    for i in range(N):
        dy, dx = (3 * i) % 32, (5 * i) % 32
        frames.append((base[0][dy:dy + H, dx:dx + W],
                       base[1][dy // 2:dy // 2 + H // 2,
                               dx // 2:dx // 2 + W // 2],
                       base[2][dy // 2:dy // 2 + H // 2,
                               dx // 2:dx // 2 + W // 2]))
    stream = oracle_encode(frames, W, H, qp=28, gop=N)
    golden, _, _ = oracle_decode(stream)
    pics = FastH264Parser().parse_annexb(stream)

    cfg = ShardingConfig(dp=1, sp=4)
    mesh = build_mesh(cfg)
    dpb = []
    for i, ((fs, sps), (gy, gu, gv)) in enumerate(zip(pics, golden)):
        if fs.mv is None:
            Y, U, V = decode_frame_rows_sharded(fs, mesh=mesh, cfg=cfg)
        else:
            Y, U, V = decode_frame_rows_sharded_inter(
                fs, dpb, mesh=mesh, cfg=cfg)
            want = RT.decode_frame_symbols_inter(fs, dpb)
            assert np.array_equal(Y, np.asarray(want[0])), f"frame {i}"
        h, w = gy.shape
        assert np.array_equal(Y[:h, :w], gy), f"frame {i} vs oracle"
        assert np.array_equal(U[:h // 2, :w // 2], gu), f"frame {i} U"
        # x264 medium keeps up to 3 references; list0 = descending PicNum
        dpb.insert(0, RT.pad_ref_device(jnp.asarray(Y), jnp.asarray(U),
                                        jnp.asarray(V)))
        del dpb[3:]
