"""Sampler / loader / schedule tests (reference semantics,
libs/datasets/samplers.py + libs/utils/lr_scheduler.py)."""

import numpy as np

from gpnerf_tpu.data.loader import (
    BatchSampler,
    DistributedSampler,
    FrameSampler,
    IterationBasedBatchSampler,
    SequentialSampler,
)
from gpnerf_tpu.train.lr import (
    exponential_epoch_schedule,
    multistep_epoch_schedule,
    warmup_multistep_epoch_schedule,
)


class FakeDataset:
    def __init__(self, n, num_cams=4):
        self.n = n
        self.num_cams = num_cams

    def __len__(self):
        return self.n


def test_frame_sampler_every_30th_frame():
    ds = FakeDataset(120 * 4, num_cams=4)
    fs = FrameSampler(ds)
    inds = list(fs)
    # 120 frames -> frames 0, 30, 60, 90 -> x4 cams = 16 indices
    assert len(inds) == 16
    assert inds[:4] == [0, 1, 2, 3]
    assert inds[4:8] == [120, 121, 122, 123]


def test_iteration_based_batch_sampler_wraps():
    ds = FakeDataset(5)
    bs = BatchSampler(SequentialSampler(ds), 1, drop_last=True)
    it = IterationBasedBatchSampler(bs, num_iterations=12)
    batches = list(it)
    assert len(batches) == 12
    assert [b[0] for b in batches[:6]] == [0, 1, 2, 3, 4, 0]


def test_distributed_sampler_partitions():
    ds = FakeDataset(10)
    parts = []
    for rank in range(3):
        s = DistributedSampler(ds, num_replicas=3, rank=rank, shuffle=False)
        parts.append(list(s))
    assert all(len(p) == 4 for p in parts)  # ceil(10/3)*3 = 12 padded
    flat = sum(parts, [])
    assert set(flat) == set(range(10))
    # epoch-seeded shuffle determinism
    s = DistributedSampler(ds, 2, 0, shuffle=True)
    s.set_epoch(3)
    a = list(s)
    s.set_epoch(3)
    assert a == list(s)
    s.set_epoch(4)
    assert a != list(s)


def test_exponential_schedule_matches_reference_formula():
    sched = exponential_epoch_schedule(1e-4, 0.1, 1000, 500)
    assert np.isclose(sched(0), 1e-4)
    # after 500 epochs (250000 steps): 1e-4 * 0.1^(500/1000)
    assert np.isclose(sched(500 * 500), 1e-4 * 0.1**0.5)
    # constant within an epoch
    assert sched(10) == sched(499)


def test_multistep_and_warmup_schedules():
    ms = multistep_epoch_schedule(1.0, [2, 4], 0.1, ep_iter=1)
    assert ms(0) == 1.0 and ms(2) == 0.1 and np.isclose(ms(4), 0.01)
    wm = warmup_multistep_epoch_schedule(1.0, [10], 0.1, 1 / 3, 3, ep_iter=1)
    assert np.isclose(wm(0), 1 / 3)
    assert wm(3) == 1.0
    assert np.isclose(wm(10), 0.1)


def test_multiworker_loader_matches_sync_order():
    """DataLoader(num_workers>0) streams the same items in the same order as
    the synchronous path (the reference's torch worker processes,
    tools/train.py:187-204)."""
    from gpnerf_tpu.data.loader import BatchSampler, DataLoader, SequentialSampler

    class SquareDS:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return {"i": np.asarray(i), "sq": np.asarray(i * i)}

    ds = SquareDS()
    bs = lambda: BatchSampler(SequentialSampler(ds), 1, False)
    sync = list(DataLoader(ds, bs(), prefetch=0))
    ldr = DataLoader(ds, bs(), num_workers=3)
    par = list(ldr)
    par2 = list(ldr)  # pool reuse across epochs
    ldr.close()
    assert [int(d["i"]) for d in par] == [int(d["i"]) for d in sync]
    assert [int(d["sq"]) for d in par2] == [i * i for i in range(13)]
