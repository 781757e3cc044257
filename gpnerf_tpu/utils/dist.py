"""Distributed-runtime helpers.

Twin of the reference's torch.distributed utilities
(/root/reference/libs/utils/misc.py:93-160,341-407): rank/world queries,
main-process gating, cross-process dict reduction and object all-gather.
NCCL process groups become jax.distributed / jax processes; device-array
collectives live inside compiled steps (parallel/dp.py); these helpers
cover the host-side control plane."""

from __future__ import annotations

import jax
import numpy as np


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host initialization (replaces init_process_group,
    tools/train.py:125-131). No-op on a single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def is_dist_avail_and_initialized() -> bool:
    return get_world_size() > 1


def reduce_dict(input_dict, average=True):
    """Cross-process mean/sum of a scalar dict (misc.py:136-160). Host-side
    variant via multihost allgather; single-process is identity."""
    if get_world_size() < 2:
        return {k: float(np.asarray(v)) for k, v in input_dict.items()}
    from jax.experimental import multihost_utils

    keys = sorted(input_dict)
    vec = np.asarray([float(np.asarray(input_dict[k])) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vec)
    red = gathered.sum(axis=0)
    if average:
        red = red / get_world_size()
    return dict(zip(keys, red.tolist()))


def all_gather(data):
    """All-gather arbitrary pickleable objects (misc.py:93-133)."""
    if get_world_size() < 2:
        return [data]
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([len(blob)], np.int64))
    max_len = int(sizes.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: len(blob)] = blob
    all_blobs = multihost_utils.process_allgather(padded)
    out = []
    for i in range(get_world_size()):
        out.append(pickle.loads(all_blobs[i, : int(sizes[i, 0])].tobytes()))
    return out


def barrier():
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gpnerf_barrier")
