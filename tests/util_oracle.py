"""Helpers for the libavcodec conformance oracle (built on demand)."""

import math
import os
import subprocess
import tempfile

import numpy as np

ORACLE_DIR = os.path.join(os.path.dirname(__file__), "oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "oracle")


def have_oracle() -> bool:
    if os.path.exists(ORACLE_BIN):
        return True
    try:
        subprocess.run(["make", "-C", ORACLE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(ORACLE_BIN)
    except Exception:
        return False


def oracle_decode(stream: bytes, suffix=".h264"):
    """Decode an elementary stream -> (frames, W, H); frames = [(Y,U,V), ...]."""
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in" + suffix)
        outp = os.path.join(d, "out.i420")
        open(inp, "wb").write(stream)
        res = subprocess.run([ORACLE_BIN, "decode", inp, outp],
                             capture_output=True, text=True, check=True)
        W, H, N = map(int, res.stdout.split())
        raw = np.fromfile(outp, np.uint8)
    frames = []
    fs = W * H * 3 // 2
    for i in range(N):
        f = raw[i * fs:(i + 1) * fs]
        Y = f[:W * H].reshape(H, W)
        U = f[W * H:W * H + W * H // 4].reshape(H // 2, W // 2)
        V = f[W * H + W * H // 4:].reshape(H // 2, W // 2)
        frames.append((Y, U, V))
    return frames, W, H


def oracle_encode(frames, W, H, qp=30, codec="libx264", gop=1,
                  preset="medium", extra=None, profile=None) -> bytes:
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.i420")
        outp = os.path.join(d, "out.es")
        with open(inp, "wb") as f:
            for (Y, U, V) in frames:
                f.write(np.asarray(Y, np.uint8).tobytes())
                f.write(np.asarray(U, np.uint8).tobytes())
                f.write(np.asarray(V, np.uint8).tobytes())
        cmd = [ORACLE_BIN, "encode", inp, str(W), str(H), str(qp),
               outp, codec, str(gop), preset]
        if extra or profile:
            cmd.append(extra or "")
        if profile:
            cmd.append(profile)
        subprocess.run(cmd, capture_output=True, check=True)
        return open(outp, "rb").read()


def make_frame(W, H, seed=0, kind="gradient_noise"):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:H, 0:W]
    if kind == "gradient_noise":
        Y = ((x * 3 + y * 2) % 256).astype(np.int32)
        Y = np.clip(Y + rng.integers(-24, 24, (H, W)), 0, 255)
    elif kind == "flat":
        Y = np.full((H, W), 128, np.int32)
    elif kind == "noise":
        Y = rng.integers(0, 256, (H, W)).astype(np.int32)
    elif kind == "edges":
        Y = ((x // 8 + y // 8) % 2 * 200 + 28).astype(np.int32)
    else:
        raise ValueError(kind)
    cy, cx = np.mgrid[0:H // 2, 0:W // 2]
    U = np.clip(((cx * 2) % 200 + 28) + rng.integers(-8, 8, (H // 2, W // 2)),
                0, 255)
    V = np.clip(((cy * 2) % 200 + 28) + rng.integers(-8, 8, (H // 2, W // 2)),
                0, 255)
    return (Y.astype(np.uint8), U.astype(np.uint8), V.astype(np.uint8))


def psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = ((a - b) ** 2).mean()
    if mse == 0:
        return float("inf")
    return 10 * math.log10(255.0 ** 2 / mse)
