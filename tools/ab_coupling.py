"""Real-TPU A/B for coupling-cadence temporal blocking (cfg.coupling_k).

One TPU client (attachment init is expensive - CLAUDE.md):
  1. physics gate first, for EVERY k > 1 being benched:
     tools/validate_tpu.py couplingk (settling vs the f64 per-step
     oracle golden, <1% budget) - a tier that fails physics must not
     get benched into the record (AB_SKIP_GATE=1 skips when the gate
     already ran this session)
  2. coupled bench at 4096^2/10k: f32 and bf16+ramp, k=1 vs k=4 by
     default; BENCH_KS overrides the k list (e.g. BENCH_KS=1,4,8)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_coupling.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)

ks = tuple(int(k) for k in os.environ["BENCH_KS"].split(",")) \
    if os.environ.get("BENCH_KS") else (1, 4)

if not os.environ.get("AB_SKIP_GATE"):
    import validate_tpu  # noqa: E402

    for k in sorted({k for k in ks if k > 1}):
        os.environ["COUPLING_K"] = str(k)
        validate_tpu._coupling_k()

from ab_bf16 import bench_coupled  # noqa: E402
results = {}
for storage, eps in (("float32", None), ("bfloat16", "ramp")):
    for k in ks:
        results[(storage, eps, k)] = bench_coupled(
            storage, coupling_k=k, eps_method=eps
        )
print("coupling-cadence A/B (4096^2/10k, MLUPS/chip):", flush=True)
for (storage, eps, k), v in results.items():
    label = storage + (f"+{eps}" if eps else "")
    print(f"  {label} k={k}: {v:.0f}", flush=True)
