"""Multi-host scaffolding (SURVEY §5.8): jax.distributed bring-up + the
GOP-DP work split across processes.

The reference is strictly single-process (SURVEY §2.3: no NCCL/MPI); the
TPU-native scaling model is `jax.distributed.initialize` + a global mesh
whose dp axis spans hosts (DCN) while sp stays intra-host (ICI). On the
dev environment no second host exists, so `init_from_env` is exercised by
tests in single-process mode and the scaling MEASUREMENT harness
(tools/jmx_scaling.py) reports 1->N device efficiency on the real decode.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import numpy as np


def init_from_env() -> dict:
    """Initialize the multi-process runtime from JMX_COORD/JMX_NPROC/
    JMX_PROC_ID (or their JAX defaults). Single-process when unset.

    Returns a bring-up report {processes, process_id, devices,
    local_devices}."""
    coord = os.environ.get("JMX_COORD")
    nproc = int(os.environ.get("JMX_NPROC", "1"))
    if coord and nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc,
            process_id=int(os.environ.get("JMX_PROC_ID", "0")))
    return {
        "processes": nproc if coord else 1,
        "process_id": jax.process_index() if coord else 0,
        "devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }


def assign_gops(n_gops: int, n_workers: int, worker: int) -> List[int]:
    """Static GOP-DP split: contiguous stripes (locality for streaming IO);
    the manifest (pipeline/gop.py) handles resume/reclaim on top."""
    per = -(-n_gops // n_workers)
    return list(range(worker * per, min(n_gops, (worker + 1) * per)))


def measure_decode_scaling(fss, n_devices_list, reps: int = 3) -> dict:
    """Frames/s of the REAL H.264 wavefront decode at each device count
    (frame-parallel dp over the mesh), same total work per point.

    Returns {n_devices: fps} plus efficiency vs the 1-device point."""
    from .decode_sharded import decode_symbols_sharded
    from .mesh import ShardingConfig, build_mesh

    results = {}
    for n in n_devices_list:
        cfg = ShardingConfig(dp=n, sp=1)
        mesh = build_mesh(cfg)
        # warmup/compile
        decode_symbols_sharded(fss, cfg=cfg, mesh=mesh)
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            Y, _, _ = decode_symbols_sharded(fss, cfg=cfg, mesh=mesh)
            dt = time.perf_counter() - t0
            best = max(best, len(fss) / dt)
        results[n] = round(best, 3)
    base = results.get(1)
    eff = {n: round(results[n] / (base * n), 3)
           for n in results if base} if base else {}
    return {"fps": results, "efficiency": eff}
