"""One-client TPU batch: prehalo compiled probe + physics validation +
pair-symmetric-collide A/B (coupled + temporal fluid) + compiled
periodic-DEM invariance check. Transient helper for this session."""
import sys
import time

sys.path.insert(0, "/root/repo/tools")

import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)

from ab_temporal import prehalo_parity_probe  # noqa: E402

prehalo_parity_probe()


import validate_tpu  # noqa: E402

t0 = time.perf_counter()
validate_tpu.main()
print(f"validation total {time.perf_counter() - t0:.0f}s", flush=True)

from ab_bf16 import bench_coupled  # noqa: E402
from ab_temporal import bench as bench_fluid  # noqa: E402

print("coupled 4096^2/10k after pair-symmetric collide (was 8.555 ms "
      "f32 / 7.598 bf16):", flush=True)
bench_coupled("float32")
bench_coupled("bfloat16")
print("pure fluid 4096^2 k=4 after pair-symmetric collide (was "
      "1.109 ms/step):", flush=True)
bench_fluid(4096, 4)
