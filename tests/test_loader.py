"""DataLoader / sampler behaviors (reference lib/datasets/samplers.py,
make_dataset.py): view-count sampling per batch, epoch-seeded shuffle,
iteration-capped cycling, per-host sharding, collation."""

import numpy as np

from enerf_tpu.datasets.loader import DataLoader, ViewCountSampler


class _FakeDataset:
    """Returns a sample whose payload identifies (index, n_views)."""

    def __init__(self, n=12):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, item):
        idx, nv = item
        return {"x": np.full((2, 3), idx, np.float32),
                "nv": np.array(nv, np.int32),
                "meta": {"idx": idx}}


def test_view_count_sampler_distribution_and_determinism():
    s = ViewCountSampler(2000, views=[2, 3, 4], probs=[0.1, 0.8, 0.1],
                         shuffle=True, seed=7)
    s.set_epoch(3)
    items = list(s)
    again = list(s)  # same epoch -> identical stream
    assert items == again
    idxs = [i for i, _ in items]
    assert sorted(idxs) == list(range(2000))  # a permutation
    counts = np.bincount([nv for _, nv in items], minlength=5)[2:5]
    # 2000 draws at p=[.1,.8,.1]: loose 5-sigma-ish bounds
    assert 120 < counts[0] < 280 and 1450 < counts[1] < 1750
    s.set_epoch(4)
    assert list(s) != items  # different epoch -> different shuffle


def test_batch_shares_view_count_and_caps_iterations():
    ds = _FakeDataset(10)
    sampler = ViewCountSampler(10, [2, 3], [0.5, 0.5], shuffle=True)
    dl = DataLoader(ds, batch_size=4, sampler=sampler, max_iter=7,
                    num_workers=2)
    batches = list(dl)
    assert len(batches) == len(dl) == 7  # cycles epochs past n//bs
    for b in batches:
        assert b["x"].shape == (4, 2, 3)  # collated
        assert b["nv"].shape == (4,)
        assert len(set(b["nv"].tolist())) == 1  # one n_views per batch
        assert b["meta"]["idx"] == [int(v) for v in b["x"][:, 0, 0]]


def test_per_host_sharding_disjoint_and_covering():
    ds = _FakeDataset(16)
    seen = []
    for rank in range(2):
        sampler = ViewCountSampler(16, [3], [1.0], shuffle=False)
        dl = DataLoader(ds, batch_size=2, sampler=sampler, max_iter=None,
                        num_workers=1, process_index=rank, process_count=2)
        got = [int(v) for b in dl for v in b["x"][:, 0, 0]]
        assert got == sorted(got)  # shuffle=False keeps stride order
        seen.append(set(got))
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == set(range(16))


def test_loader_propagates_worker_errors():
    class _Boom(_FakeDataset):
        def __getitem__(self, item):
            raise RuntimeError("boom")

    sampler = ViewCountSampler(4, [2], [1.0], shuffle=False)
    dl = DataLoader(_Boom(4), batch_size=2, sampler=sampler, max_iter=2)
    try:
        list(dl)
    except RuntimeError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("loader swallowed the worker exception")
