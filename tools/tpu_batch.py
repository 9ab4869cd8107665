"""Single-client TPU batch: every real-hardware check in ONE attachment
grant (the axon attachment degrades with client churn — batch all TPU
work per recovery window; see CLAUDE.md).

Runs: compiled prehalo probe -> full physics validation
(tools/validate_tpu.py: settling golden, DKT, periodic invariance,
Ghia cavity) -> coupled + temporal-fluid timing spot checks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/_batch_r2c.py
"""
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

print("coupled 4096^2/10k ms/step (f32 then bf16 storage):", flush=True)
bench_coupled("float32")
bench_coupled("bfloat16")
print("pure fluid 4096^2 temporal k=4 ms/step:", flush=True)
bench_fluid(4096, 4)

# bonus leg (last on purpose - a timeout here loses nothing critical):
# Schafer-Turek 2D-1 cylinder drag on the compiled f32 path.
import benchmark_cylinder  # noqa: E402

print("schafer-turek 2D-1 (f32, D=20):", flush=True)
benchmark_cylinder.main([])
