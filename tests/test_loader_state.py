"""Input-pipeline checkpointing: loader state save/restore reproduces
the exact shuffle order; mid-epoch resume yields the remaining batches."""

import numpy as np

from lsps_tpu.data.loader import DataLoader


class _Toy:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2,), float(i), np.float32)


def _orders(loader, epochs):
    out = []
    for _ in range(epochs):
        out.append(np.concatenate([b[:, 0] for b in loader]))
    return out


def test_state_roundtrip_reproduces_order():
    a = DataLoader(_Toy(10), 3, shuffle=True, seed=5)
    _ = _orders(a, 2)             # advance two epochs
    saved = a.get_state()
    next_epochs = _orders(a, 2)   # epochs 3 and 4

    b = DataLoader(_Toy(10), 3, shuffle=True, seed=999)  # different seed
    b.set_state(saved)
    resumed = _orders(b, 2)
    for x, y in zip(next_epochs, resumed):
        np.testing.assert_array_equal(x, y)


def test_iter_from_mid_epoch():
    a = DataLoader(_Toy(10), 3, shuffle=True, seed=7)
    full = np.concatenate([b[:, 0] for b in a])

    b = DataLoader(_Toy(10), 3, shuffle=True, seed=7)
    tail = np.concatenate([x[:, 0] for x in b.iter_from(2)])
    np.testing.assert_array_equal(tail, full[6:])
