"""Multi-chip distribution layer (SURVEY.md SS5.7/5.8): lattice sharding
over an ICI mesh via shard_map, halo exchange, particle-force psum, and
multi-process launch."""

from lbmdem_tpu.parallel.launch import init_distributed, process_info
from lbmdem_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_step,
    shard_state,
    state_specs,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "make_sharded_step",
    "process_info",
    "shard_state",
    "state_specs",
]
