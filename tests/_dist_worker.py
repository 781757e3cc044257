"""Worker for the 2-process jax.distributed control-plane smoke test
(tests/test_dist_multiprocess.py). Mirrors what a multi-host launch does:
`init_distributed` (tools/train.py:125-131 analog), rank gating, dict
reduction, object all-gather, barrier, and DistributedSampler rank slicing
(/root/reference/libs/datasets/samplers.py:86-142).

Usage: python tests/_dist_worker.py <coordinator> <world> <rank> <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, world, rank, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    from gpnerf_tpu.utils import dist

    dist.init_distributed(coordinator, world, rank)
    assert dist.get_rank() == rank
    assert dist.get_world_size() == world
    assert dist.is_dist_avail_and_initialized()
    assert dist.is_main_process() == (rank == 0)

    # reduce_dict: mean of rank-dependent scalars (misc.py:136-160 analog)
    red = dist.reduce_dict({"loss": 1.0 + rank, "psnr": 10.0 * (rank + 1)})

    # all_gather of pickled objects (misc.py:93-133 analog)
    gathered = dist.all_gather({"rank": rank, "tag": "x" * (rank + 1)})

    # DistributedSampler: rank-sliced contiguous shards (samplers.py:86-142)
    from gpnerf_tpu.data.loader import DistributedSampler

    class _DS:
        def __len__(self):
            return 10

    smp = DistributedSampler(_DS(), num_replicas=world, rank=rank, shuffle=False)
    indices = list(iter(smp))

    dist.barrier()
    with open(out_path, "w") as f:
        json.dump(
            {
                "rank": rank,
                "world": world,
                "reduced": red,
                "gathered": gathered,
                "indices": indices,
                "is_main": dist.is_main_process(),
            },
            f,
        )


if __name__ == "__main__":
    main()
