"""Record / playback harness.

Equivalent of the reference's de-facto integration-test subsystem
(recordImu/recordImage/recordVins + start_playback,
ViewController.mm:1555-1714, SURVEY.md §4 item 2): raw sensor streams
and estimator outputs serialize to one compressed npz; replay feeds them
deterministically through the same pipeline. Unlike the reference, the
recorder also checkpoints full estimator state (orbax-style pytree
snapshot) for true resume (SURVEY.md §5.4).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional

import jax
import numpy as np


class Recorder:
    """Accumulates per-frame sensor inputs and outputs, then saves."""

    def __init__(self):
        self.frames: List[Dict[str, Any]] = []

    def add(self, **arrays):
        self.frames.append({k: np.asarray(v) for k, v in arrays.items()})

    def save(self, path: str):
        if not self.frames:
            raise ValueError("nothing recorded")
        keys = self.frames[0].keys()
        stacked = {k: np.stack([f[k] for f in self.frames]) for k in keys}
        np.savez_compressed(path, **stacked)

    @staticmethod
    def load(path: str) -> Dict[str, np.ndarray]:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}


def save_checkpoint(path: str, state) -> None:
    """Snapshot any pytree (estimator state, keyframe DB, ...) to disk."""
    leaves, treedef = jax.tree.flatten(state)
    payload = {
        "treedef": pickle.dumps(treedef),
        "leaves": [np.asarray(l) for l in leaves],
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    treedef = pickle.loads(payload["treedef"])
    return jax.tree.unflatten(treedef, payload["leaves"])
