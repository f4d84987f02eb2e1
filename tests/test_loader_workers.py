"""SceneLoader multi-worker pool: determinism, ordering, real concurrency."""
import time

import numpy as np

from sgcdet_tpu.data.loader import SceneLoader


class _FakeDataset:
    def __init__(self, n=16, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)  # simulates blocking decode/IO (GIL released)
        return {
            "imgs": np.full((2, 3, 4, 4), i, np.float32),
            "proj_img": np.zeros((2, 3, 4), np.float32),
            "proj_feat4": np.zeros((2, 4, 4), np.float32),
            "origin": np.zeros((3,), np.float32),
            "index": i,
        }


def _collect(loader):
    return [b["index"].tolist() for b in loader]


def test_workers_match_serial_order():
    kw = dict(batch_size=4, shuffle=True, seed=3)
    serial = _collect(SceneLoader(_FakeDataset(), num_workers=0, **kw))
    pooled = _collect(SceneLoader(_FakeDataset(), num_workers=4, **kw))
    assert serial == pooled
    assert len(serial) == 4


def test_workers_overlap_decode():
    delay, n = 0.05, 16
    t0 = time.perf_counter()
    _collect(SceneLoader(_FakeDataset(n, delay), batch_size=4, shuffle=False,
                         num_workers=8))
    elapsed = time.perf_counter() - t0
    # serial would be ~0.8s; 8 workers should land well under half
    assert elapsed < n * delay * 0.6, elapsed


def test_tail_batch_and_host_shard():
    ld = SceneLoader(_FakeDataset(10), batch_size=4, shuffle=False,
                     num_workers=2, drop_last=False)
    batches = _collect(ld)
    assert [len(b) for b in batches] == [4, 4, 2]
    ld0 = SceneLoader(_FakeDataset(10), batch_size=1, shuffle=False,
                      num_workers=2, host_id=0, num_hosts=2)
    ld1 = SceneLoader(_FakeDataset(10), batch_size=1, shuffle=False,
                      num_workers=2, host_id=1, num_hosts=2)
    got = sorted(sum(_collect(ld0) + _collect(ld1), []))
    assert got == list(range(10))
