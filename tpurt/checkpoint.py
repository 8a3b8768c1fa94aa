"""Checkpoint / resume + scene-keyed BVH cache.

The reference has no persistent state (SURVEY.md §5); the rebuild adds two
cheap, useful pieces:

1. **Accumulation checkpoints** (config 3): long temporal accumulations
   serialize (accum buffer, frame index, seed) and resume exactly.
2. **BVH cache**: LBVH builds are keyed by a hash of (geometry, leaf_size);
   reloading a scene skips the build entirely (the reference rebuilds its
   CPU BVH on every startup, seconds for Sponza [RECALL]).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Tuple

import numpy as np

from .bvh.lbvh import LBVH


def save_accumulation(path: str, accum, frame_index: int, seed: int) -> None:
    np.savez_compressed(path, accum=np.asarray(accum),
                        frame_index=np.int64(frame_index),
                        seed=np.int64(seed))


def load_accumulation(path: str) -> Tuple[np.ndarray, int, int]:
    with np.load(path) as z:
        return z["accum"], int(z["frame_index"]), int(z["seed"])


def scene_key(vertices: np.ndarray, indices: np.ndarray,
              leaf_size: int) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(vertices, np.float32).tobytes())
    h.update(np.ascontiguousarray(indices, np.int32).tobytes())
    h.update(str(leaf_size).encode())
    return h.hexdigest()[:24]


_FIELDS = ("nodes_box", "nodes_child", "nodes_first", "nodes_last", "tri_v0",
           "tri_e1", "tri_e2", "tri_sorted", "tri_id", "root_min",
           "root_max")


# Optional sub-leaf clustering fields (round 5) — absent in caches of
# unclustered trees and in pre-round-5 cache files (both load as None).
_OPT_FIELDS = ("leaf_block", "leaf_min", "leaf_max")


def save_bvh(cache_dir: str, key: str, bvh: LBVH) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"lbvh_{key}.npz")
    opt = {f: np.asarray(getattr(bvh, f)) for f in _OPT_FIELDS
           if getattr(bvh, f) is not None}
    np.savez_compressed(path, leaf_size=np.int64(bvh.leaf_size),
                        **{f: np.asarray(getattr(bvh, f)) for f in _FIELDS},
                        **opt)
    return path


def load_bvh(cache_dir: str, key: str) -> Optional[LBVH]:
    path = os.path.join(cache_dir, f"lbvh_{key}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return LBVH(**{f: z[f] for f in _FIELDS},
                    **{f: z[f] for f in _OPT_FIELDS if f in z},
                    leaf_size=int(z["leaf_size"]))
