"""HBM-resident dataset cache: the whole dataset lives on device.

At this problem's scale (the reference's full augmented set is ~20k
224x224x3 uint8 images = ~3 GB) the entire dataset fits in a single v5e
chip's HBM alongside the 5.7M-param model. Caching it there removes the
host from the steady-state training loop completely: each step is a device
gather ``images[idx]`` (HBM->HBM) feeding the jit'd train step — no PIL, no
per-batch H2D copy, no host threads. Augmentation already runs on device
(ops/preprocess.py), so after the one-time upload the input pipeline is
pure XLA.

``DeviceLoader`` is a drop-in replacement for ``data.dataset.Loader``
(yields the same fixed-shape dict batches), so Trainer/Evaluator run
unchanged. Epoch shuffling happens host-side on int32 indices (cheap);
the per-batch gather is jit-compiled once.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceLoader:
    """Device-resident dataset + fixed-shape batch iterator."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 device: Optional[jax.Device] = None):
        n = len(dataset)
        first_img, _, _ = dataset[0]
        images = np.empty((n, *first_img.shape), np.uint8)
        labels = np.empty((n,), np.int32)
        severity = np.empty((n,), np.float32)
        for i in range(n):
            img, lab, sev = dataset[i]
            images[i], labels[i], severity[i] = img, lab, sev

        put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        self._images = put(images)
        self._labels = put(labels)
        self._severity = put(severity)

        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0
        self.n = n

        @jax.jit
        def _gather(images, labels, severity, idx, valid):
            return {"images": images[idx], "labels": labels[idx],
                    "severity": severity[idx], "valid": valid}

        self._gather = _gather

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    @property
    def nbytes(self) -> int:
        return (self._images.nbytes + self._labels.nbytes
                + self._severity.nbytes)

    @property
    def arrays(self):
        """The device-resident (images, labels, severity) arrays — consumed
        by the scanned-epoch trainer path."""
        return self._images, self._labels, self._severity

    def epoch_index_plan(self) -> np.ndarray:
        """Advance the epoch counter and return the epoch's shuffled
        ``(steps, batch)`` int32 index matrix (full batches only) for
        the one-dispatch ``lax.scan`` training path."""
        self._epoch += 1
        order = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        steps = self.n // self.batch_size
        return order[:steps * self.batch_size].reshape(
            steps, self.batch_size).astype(np.int32)

    def eval_index_plan(self):
        """Unshuffled full-coverage ``(steps, batch)`` index plan plus the
        matching ``(steps, batch)`` valid mask (tail zero-padded) for the
        scanned evaluation path."""
        bs = self.batch_size
        steps = (self.n + bs - 1) // bs
        idx = np.zeros((steps, bs), np.int32)
        valid = np.zeros((steps, bs), np.float32)
        flat = np.arange(self.n)
        for s in range(steps):
            chunk = flat[s * bs:(s + 1) * bs]
            idx[s, :len(chunk)] = chunk
            valid[s, :len(chunk)] = 1.0
        return idx, valid

    def __iter__(self):
        self._epoch += 1
        order = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        stop = self.n - self.n % self.batch_size if self.drop_last else self.n
        bs = self.batch_size
        for start in range(0, stop, bs):
            idx = order[start:start + bs]
            n_valid = len(idx)
            if n_valid < bs:                   # pad the tail batch
                idx = np.concatenate([idx, np.zeros(bs - n_valid, np.int64)])
            valid = jnp.asarray(
                (np.arange(bs) < n_valid).astype(np.float32))
            yield dict(self._gather(self._images, self._labels,
                                    self._severity, jnp.asarray(idx), valid))


def device_cache_loaders(train_ds, val_ds, test_ds, batch_size: int,
                         seed: int = 42):
    """Build HBM-resident loaders for the standard three splits."""
    train = DeviceLoader(train_ds, batch_size, shuffle=True, drop_last=True,
                         seed=seed)
    val = DeviceLoader(val_ds, batch_size)
    test = DeviceLoader(test_ds, batch_size)
    return train, val, test
