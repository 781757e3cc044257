"""Deterministic bench/profile frame sets, cached on disk.

Every TPU measurement run (bench.py, tools/profile_demo.py,
tools/quality_sweep.py) begins by building N fixture frames host-side —
synthetic image rendering + sparse-pyramid tables on one CPU core costs
minutes per run and dwarfs the measurement itself. The frame set is a pure
function of (dataset config, tpu capacities, item indices, per-item seeds),
so it is pickled once under artifacts/frame_cache/ keyed by that
fingerprint and reloaded in seconds afterwards.

Protocol (the determinism rule from PROGRESS.md): BOTH stdlib `random` and
`np.random` are seeded per item — eval view selection draws from stdlib
random (data/base.py select_views, mirroring ZjumocapDataset.py:310-353).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import random

import numpy as np

_CACHE_VERSION = 1


def _fingerprint(cfg, indices) -> str:
    # ONLY keys that change the host-built batch dicts: the dataset block
    # and the pyramid-table capacities. The rest of cfg.tpu (renderer
    # knobs) must NOT invalidate the cache — adding a renderer option
    # would force a minutes-long frame rebuild per measurement run.
    relevant = {
        "v": _CACHE_VERSION,
        "dataset": repr(cfg.dataset),
        "site_cap": cfg.tpu.site_cap,
        "level_caps": list(cfg.tpu.level_caps),
        "max_out_sh": list(cfg.tpu.max_out_sh),
        "head": repr(cfg.head),
        "cam_num": cfg.cam_num,
        "src_view_num": cfg.src_view_num,
        "indices": list(indices),
    }
    return hashlib.sha256(repr(sorted(relevant.items())).encode()).hexdigest()[:16]


def get_bench_frames(cfg, n_frames=10, cache_root=None, verbose=True):
    """The bench frame protocol: stride across the test set, both RNGs
    seeded with the item's position. n_frames=None takes the FULL test set
    (the quality_sweep protocol — stride 1, seed == index). Returns a list
    of host batch dicts."""
    from gpnerf_tpu.registry import get

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    if n_frames is None:
        n_frames = len(ds)
    stride = max(1, len(ds) // n_frames)
    indices = [i * stride for i in range(n_frames)]

    if cache_root is None:
        cache_root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "artifacts", "frame_cache"
        )
    key = _fingerprint(cfg, indices)
    path = os.path.join(cache_root, f"frames_{key}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            frames = pickle.load(f)
        if verbose:
            import sys
            print(f"# frame cache hit: {path}", file=sys.stderr)
        return frames

    frames = []
    for pos, idx in enumerate(indices):
        random.seed(pos)
        np.random.seed(pos)
        frames.append(ds[idx])
    os.makedirs(cache_root, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(frames, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    if verbose:
        import sys
        print(f"# frame cache write: {path}", file=sys.stderr)
    return frames
