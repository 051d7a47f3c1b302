"""Device mesh / sharding configuration (SURVEY §2.3, §5.8).

The reference had no distributed layer (single GPU, 2 threads); here the
scaling axes are first-class:

  dp — GOP/frame data parallelism (independent closed GOPs across hosts/chips;
       the analog of running N reference decoder instances)
  sp — spatial parallelism (frame rows / CTU-tile rows across chips, halo
       exchange over ICI for filters that cross shard boundaries)

Collectives ride the mesh via shard_map; inter-host distribution of GOPs uses
jax.distributed + DCN (pipeline/gop.py schedules, this module shards).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class ShardingConfig:
    dp: int = 1          # frame/GOP-parallel ways
    sp: int = 1          # spatial (row-shard) ways
    axis_dp: str = "dp"
    axis_sp: str = "sp"

    @property
    def n_devices(self) -> int:
        return self.dp * self.sp

    @staticmethod
    def auto(n_devices: Optional[int] = None, sp: int = 2) -> "ShardingConfig":
        n = n_devices or len(jax.devices())
        if n == 1:
            return ShardingConfig(1, 1)
        sp = min(sp, n)
        while n % sp:
            sp -= 1
        return ShardingConfig(dp=n // sp, sp=sp)


def build_mesh(cfg: ShardingConfig, devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None
                      else jax.devices()[:cfg.n_devices])
    if devs.size != cfg.n_devices:
        raise ValueError(f"need {cfg.n_devices} devices, have {devs.size}")
    return Mesh(devs.reshape(cfg.dp, cfg.sp), (cfg.axis_dp, cfg.axis_sp))


def frame_batch_spec(cfg: ShardingConfig) -> P:
    """Batch of frames [B, H, W]: B over dp, rows over sp."""
    return P(cfg.axis_dp, cfg.axis_sp, None)


def shard_frames(mesh: Mesh, cfg: ShardingConfig, arr):
    return jax.device_put(arr, NamedSharding(mesh, frame_batch_spec(cfg)))


def shard_batch(mesh: Mesh, cfg: ShardingConfig, arr):
    """Shard the leading (frame) axis over EVERY device (dp and sp jointly);
    all other axes replicated. Used by the real-kernel decode stage."""
    spec = P((cfg.axis_dp, cfg.axis_sp), *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
