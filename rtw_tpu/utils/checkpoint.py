"""Accumulator checkpoint / resume.

The reference is a single-shot render with no persistence (SURVEY §5): a
preempted run loses everything.  Here the (radiance_sum, spp_done, rng seed,
config fingerprint) tuple is periodically saved so long renders resume
deterministically: the sample loop continues at `spp_done` with the same
counter-based keys, producing the bit-exact image the uninterrupted run
would have produced.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


def _fingerprint(cfg) -> str:
    d = dataclasses.asdict(cfg)
    # the accumulator is stored in lane order; bump when the lane->pixel
    # mapping changes (render.tile_permutation) so stale checkpoints from a
    # different layout are rejected instead of resumed scrambled
    d["_pixel_layout"] = "tile32"
    return json.dumps(d, sort_keys=True)


def save(path: str, cfg, accum: np.ndarray, rays: float, spp_done: int) -> None:
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp,
        accum=np.asarray(accum),
        rays=np.float64(rays),
        spp_done=np.int64(spp_done),
        fingerprint=np.bytes_(_fingerprint(cfg).encode()),
    )
    # np.savez appends .npz
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def load(path: str, cfg):
    """Returns (accum, rays, spp_done) or None if absent/mismatched."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        fp = bytes(z["fingerprint"]).decode()
        if fp != _fingerprint(cfg):
            return None
        return np.asarray(z["accum"]), float(z["rays"]), int(z["spp_done"])
