"""Multi-process launch (SURVEY.md SS5.8 distributed backend).

The reference is single-process/single-GPU; scaling beyond one host is
new TPU-native work. On a TPU pod slice each host runs the same program;
`jax.distributed.initialize()` discovers coordinator/process topology
from the TPU metadata automatically. On CPU/GPU clusters (or forced
multi-process testing) the coordinator address and process ids come from
arguments or the standard env vars.

Typical pod usage:

    from lbmdem_tpu.parallel import init_distributed, make_mesh
    init_distributed()               # no-op args on TPU pods
    mesh = make_mesh()               # all global devices
    sim = Simulation(cfg, disks, use_pallas=True, mesh=mesh)
    sim.run()

Each process then drives the same jitted sharded step; JAX executes it
SPMD over the global device set, with our ppermute halos riding ICI.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments: on TPU pods the topology is auto-discovered; on
    other platforms the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env vars are honored when set. A single-process call
    (num_processes in (None-on-single-host, 1)) is valid and exercises
    the same code path the pod launch uses.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    kw = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if num_processes is not None:
        kw["num_processes"] = num_processes
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if process_id is None and env_pid:
        process_id = int(env_pid)
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)
    _INITIALIZED = True


def process_info():
    """(process_index, process_count, local_devices, global_devices)."""
    import jax

    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
