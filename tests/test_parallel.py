"""Sharded transcode step on the virtual 8-device CPU mesh: shardings must
compile+run, collectives must match the single-device reference."""

import jax
import numpy as np
import pytest

from jmcodec_tpu.parallel.mesh import ShardingConfig, build_mesh, shard_frames
from jmcodec_tpu.parallel.transcode import (make_transcode_step,
                                            run_transcode_demo)


def test_mesh_auto_config():
    cfg = ShardingConfig.auto(8)
    assert cfg.n_devices == 8
    assert cfg.sp >= 1 and cfg.dp * cfg.sp == 8
    assert ShardingConfig.auto(1).n_devices == 1
    assert ShardingConfig.auto(6, sp=4).n_devices == 6  # sp adjusts to divide


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_transcode_step_8dev_matches_1dev():
    rng = np.random.default_rng(1)
    B, H, W = 4, 64, 64
    Y = rng.integers(0, 256, (B, H, W), np.uint8)

    cfg8 = ShardingConfig.auto(8)
    mesh8 = build_mesh(cfg8)
    step8 = make_transcode_step(mesh8, cfg8, qp=30)
    z8, bits8, ssd8 = step8(shard_frames(mesh8, cfg8, Y))

    cfg1 = ShardingConfig(1, 1)
    mesh1 = build_mesh(cfg1, devices=jax.devices()[:1])
    step1 = make_transcode_step(mesh1, cfg1, qp=30)
    z1, bits1, ssd1 = step1(shard_frames(mesh1, cfg1, Y))

    # levels identical except at sp-shard boundary rows (the downscale filter
    # legitimately sees replicated vs true neighbor rows there only if we had
    # NOT exchanged halos; with ppermute they must be identical everywhere)
    np.testing.assert_array_equal(np.asarray(z8), np.asarray(z1))
    assert int(bits8) == int(bits1)
    assert int(ssd8) == int(ssd1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_transcode_demo_entrypoint():
    z, bits, ssd, cfg = run_transcode_demo(8)
    assert z.ndim == 5 and bits > 0 and ssd >= 0
    assert cfg.n_devices == 8


# ---------------------------------------------------------------------------
# REAL decoder under the mesh (round 2: VERDICT "shard the real decoder")
# ---------------------------------------------------------------------------

@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_real_decode_sharded_8dev_bit_exact():
    """The production H.264 wavefront kernel, frames sharded over an 8-way
    mesh, must be bit-exact vs the single-device kernel AND vs libavcodec."""
    from util_oracle import have_oracle, make_frame, oracle_decode, \
        oracle_encode
    if not have_oracle():
        pytest.skip("oracle unavailable")
    from jmcodec_tpu.codec.h264.fastdec import FastH264Parser
    from jmcodec_tpu.parallel.decode_sharded import decode_symbols_sharded

    W, H, N = 192, 96, 6  # deliberately not divisible by 8: pad path
    frames = [make_frame(W, H, seed=i) for i in range(N)]
    stream = oracle_encode(frames, W, H, qp=28, gop=1)
    golden, _, _ = oracle_decode(stream)

    parser = FastH264Parser()
    fss = [fs for fs, _ in parser.parse_annexb(stream)]
    assert len(fss) == N

    cfg = ShardingConfig.auto(8)
    Y, U, V = decode_symbols_sharded(fss, cfg=cfg)
    for i, (gy, gu, gv) in enumerate(golden):
        np.testing.assert_array_equal(Y[i, :H, :W], gy, f"frame {i} Y")
        np.testing.assert_array_equal(U[i, :H // 2, :W // 2], gu)
        np.testing.assert_array_equal(V[i, :H // 2, :W // 2], gv)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_real_transcode_step_8dev():
    """Full sharded step (real decode -> sp reshard -> halo downscale ->
    encode forward -> psum stats) compiles and runs; stats match 1-dev."""
    from jmcodec_tpu.parallel.decode_sharded import (
        make_transcode_real_step, pad_batch, _synthetic_symbols)
    from jmcodec_tpu.parallel.mesh import shard_batch
    from jmcodec_tpu.kernels.recon import stack_symbols

    mbh, mbw, N = 4, 6, 8
    fss = _synthetic_symbols(mbh, mbw, n=N)
    args = stack_symbols(fss)

    cfg8 = ShardingConfig.auto(8)
    mesh8 = build_mesh(cfg8)
    a8, _ = pad_batch(args, cfg8.n_devices)
    step8 = make_transcode_real_step(mesh8, cfg8, mbh, mbw)
    z8, bits8, ssd8 = step8(*[shard_batch(mesh8, cfg8, a) for a in a8])

    cfg1 = ShardingConfig(1, 1)
    mesh1 = build_mesh(cfg1, devices=jax.devices()[:1])
    step1 = make_transcode_real_step(mesh1, cfg1, mbh, mbw)
    z1, bits1, ssd1 = step1(*[shard_batch(mesh1, cfg1, a) for a in args])

    assert int(bits8) == int(bits1)
    assert int(ssd8) == int(ssd1)
    np.testing.assert_array_equal(np.asarray(z8), np.asarray(z1))
