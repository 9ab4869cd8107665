"""Checkpoint / resume (SURVEY.md SS5.4).

The reference loses a run on crash; here the full SimState pytree
(distributions, disk SoA, step counter, diagnostics) serializes to one
.npz - no external services, portable across hosts, resumable into the
same or a differently-sharded run (arrays are global). Identical-
trajectory resume is enforced by tests/test_aux.py.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_MAGIC = "lbmdem_tpu_ckpt_v1"


def save_state(path: str, state, cfg=None) -> None:
    import dataclasses
    import json

    def host(x):
        a = np.asarray(x)
        # bf16 isn't a native numpy dtype (.npz can't store it); widen
        # to f32 on save (exact), load_state casts back via the template
        return a.astype(np.float32) if a.dtype.name == "bfloat16" else a

    leaves, _ = jax.tree.flatten(state)
    arrs = {f"leaf_{i}": host(x) for i, x in enumerate(leaves)}
    meta = {"magic": _MAGIC, "n_leaves": len(leaves)}
    if cfg is not None:
        meta["config"] = dataclasses.asdict(cfg)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"  # atomic write: tmp + rename
    np.savez(tmp, __meta__=np.asarray(json.dumps(meta)), **arrs)
    os.replace(tmp, path)


def load_state(path: str, like) -> "SimState":
    """Restore into the structure of `like` (a SimState template)."""
    with np.load(path, allow_pickle=False) as z:
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    template_leaves, treedef = jax.tree.flatten(like)
    assert len(leaves) == len(template_leaves), (
        f"checkpoint has {len(leaves)} leaves, state needs "
        f"{len(template_leaves)}"
    )
    for got, want in zip(leaves, template_leaves):
        assert got.shape == want.shape, (
            f"checkpoint leaf shape {got.shape} != state {want.shape} "
            f"(different lattice/disk capacity?)"
        )
    return jax.tree.unflatten(
        treedef,
        [jax.numpy.asarray(x).astype(w.dtype)
         for x, w in zip(leaves, template_leaves)],
    )
