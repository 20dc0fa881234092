"""Checkpoint / resume for progressive renders.

The reference has no checkpointing (SURVEY.md §5) but its state is
trivially checkpointable: the HDR sum image + iteration counter + frame
(``src/main.cpp:108-110,163-173``).  We persist exactly that, plus the
seed; deterministic ``fold_in`` keying (ops/rng.py) makes resume *exact* —
iteration k draws the same samples whether or not the process restarted.
"""

from __future__ import annotations

import os

import numpy as np


def save(path: str, accum, spp_done: int, frame: int, seed: int) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        accum=np.asarray(accum),
        spp_done=np.int64(spp_done),
        frame=np.int64(frame),
        seed=np.int64(seed),
    )
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load(path: str):
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {
            "accum": z["accum"],
            "spp_done": int(z["spp_done"]),
            "frame": int(z["frame"]),
            "seed": int(z["seed"]),
        }
