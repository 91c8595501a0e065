"""Checkpoint / resume — a capability the reference lacks entirely
(SURVEY.md section 5: output dir is wiped each run, no state save).

State is tiny relative to training workloads (a few hundred MB), so a plain
compressed .npz of {f, rho, vel} per level + the step counter is sufficient
and dependency-free.  Files are written atomically (tmp + rename).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


FORMAT_VERSION = 1


def save_checkpoint(path_dir: str, step: int, states: List[Dict]) -> str:
    os.makedirs(path_dir, exist_ok=True)
    path = os.path.join(path_dir, f"ckpt_{step:08d}.npz")
    tmp = path + ".tmp"
    payload = {
        "step": np.int64(step),
        "n_levels": np.int64(len(states)),
        "format_version": np.int64(FORMAT_VERSION),
    }
    for i, st in enumerate(states):
        for key, arr in st.items():
            if key.startswith("_"):
                continue  # derived carries (e.g. "_ifsl" endpoint slabs):
                # recomputed from f/rho/vel by coarse_step.seed_slabs on
                # resume, not physical state
            a = np.asarray(arr)
            if a.dtype == jnp.bfloat16:
                # npz can't serialize the ml_dtypes extension dtype; store the
                # raw bits and tag the key (bf16 g-storage, ops.storage)
                payload[f"L{i}_{key}__bf16"] = a.view(np.uint16)
            else:
                payload[f"L{i}_{key}"] = a
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    return path


def latest_checkpoint(path_dir: str) -> Optional[str]:
    files = sorted(glob.glob(os.path.join(path_dir, "ckpt_*.npz")))
    return files[-1] if files else None


def load_checkpoint(path: str, precision: Optional[str] = None) -> Tuple[int, List[Dict]]:
    """Load a checkpoint; with `precision` given, convert the saved f arrays
    to that storage precision (a run resumed after changing
    advanced.numerics.precision would otherwise feed the compiled step a
    mismatched dtype and fail at compile)."""
    from .ops import storage

    data = np.load(path)
    ver = int(data["format_version"]) if "format_version" in data else 0
    if ver > FORMAT_VERSION:
        raise ValueError(f"checkpoint format {ver} newer than supported")
    n = int(data["n_levels"])
    states = []
    for i in range(n):
        st = {}
        for key in ("f", "rho", "vel"):
            tagged = f"L{i}_{key}__bf16"
            if tagged in data:
                st[key] = jnp.asarray(data[tagged]).view(jnp.bfloat16)
            else:
                st[key] = jnp.asarray(data[f"L{i}_{key}"])
        if precision is not None:
            st["f"] = storage.encode_f(storage.decode_f(st["f"]), precision)
        states.append(st)
    return int(data["step"]), states
