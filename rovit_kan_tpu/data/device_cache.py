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

Data parallelism: pass a ``Mesh`` — by default the arrays replicate
across it (each chip holds a dataset copy) and the Trainer's
scanned-epoch path shards each gathered batch over the mesh with a
sharding constraint, so the step math runs SPMD exactly like the host
path. Pass ``shard_data=True`` to instead store the dataset P("data")
over the mesh — 1/dp the HBM per device — with STRATIFIED batches
(batch/dp samples from each shard, strided class-balanced assignment,
per-shard shuffle) gathered shard-locally via ``shard_map``: the input
path stays collective-free at any scale.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rovit_kan_tpu.data.dataset import epoch_shuffle_seed


def make_sharded_gather(mesh):
    """Shard-LOCAL batch gather for a P("data")-sharded dataset cache.

    ``idx`` is a ``(dp, batch/dp)`` matrix of per-shard LOCAL row ids;
    each device gathers its own rows from its own shard (a ``shard_map``
    over the "data" axis — no collectives: the sharded input pipeline
    never moves samples between devices). Outputs are the ``(batch, ...)``
    arrays sharded P("data"), shard-major order."""
    from jax.sharding import PartitionSpec as P

    def local(im, lab, sev, idx):
        i = idx[0]                       # (batch/dp,) rows of this shard
        return im[i], lab[i], sev[i]

    fn = jax.shard_map(local, mesh=mesh,
                   in_specs=(P("data"), P("data"), P("data"), P("data")),
                   out_specs=P("data"))

    def gather(images, labels, severity, idx):
        ims, labs, sevs = fn(images, labels, severity, idx)
        return {"images": ims, "labels": labs, "severity": sevs}

    return gather


def make_gather(mesh, sharded: bool):
    """Batch gather for a device cache: shard-local ``shard_map`` when the
    cache is stored P("data"), plain indexing when replicated. One factory
    serves the DeviceLoader and both Trainer scan paths."""
    if sharded:
        return make_sharded_gather(mesh)
    return lambda im, lab, sev, idx: {
        "images": im[idx], "labels": lab[idx], "severity": sev[idx]}


class DeviceLoader:
    """Device-resident dataset + fixed-shape batch iterator."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 device: Optional[jax.Device] = None, mesh=None,
                 num_workers: int = 4, shard_data: bool = False):
        n = len(dataset)
        first = dataset[0]

        # ---- sharded-storage layout ---------------------------------
        # With ``shard_data`` the dataset is stored P("data") over the
        # mesh (each device holds n/dp samples) instead of replicated —
        # 1/dp the HBM. Samples are assigned to shards STRIDED
        # (shard s owns globals s, s+dp, s+2*dp, ...) so the
        # class-per-folder ordering spreads every class across every
        # shard; batches are stratified (batch_size/dp samples from each
        # shard, gathered shard-locally — zero collectives in the input
        # path) and shuffling is per-shard, the standard sharded-input-
        # pipeline trade (cf. tf.data shard-then-shuffle).
        self.dp = 1
        if shard_data and mesh is not None and "data" in mesh.shape \
                and mesh.shape["data"] > 1:
            self.dp = int(mesh.shape["data"])
            if batch_size % self.dp != 0:
                raise ValueError(f"shard_data needs batch_size "
                                 f"({batch_size}) divisible by the data "
                                 f"axis ({self.dp})")
        self.sharded = self.dp > 1
        rows_per = (n + self.dp - 1) // self.dp if self.sharded else n
        n_store = rows_per * self.dp

        s = None
        if mesh is not None:
            from rovit_kan_tpu.parallel.mesh import (batch_sharding,
                                                     replicated_sharding)
            s = (batch_sharding(mesh) if self.sharded
                 else replicated_sharding(mesh))

        # Multi-host: each process decodes ONLY the rows of its own
        # addressable shards (1/process_count of the dataset per host —
        # host RAM and decode time scale down with the job) and the global
        # array is assembled from the per-process blocks.
        lo, hi = 0, n_store
        multihost = (self.sharded and mesh is not None
                     and jax.process_count() > 1)
        if multihost:
            smap = s.addressable_devices_indices_map((n_store,))
            bounds = sorted(
                ((sl[0].start or 0,
                  n_store if sl[0].stop is None else sl[0].stop)
                 for sl in smap.values()))
            lo, hi = bounds[0][0], bounds[-1][1]
            cover = lo
            for b0, b1 in bounds:
                if b0 > cover:
                    raise ValueError(
                        "non-contiguous addressable shards — sharded "
                        "device cache needs process-major device order "
                        "(parallel.multihost.global_mesh)")
                cover = max(cover, b1)

        images = np.zeros((hi - lo, *first[0].shape), np.uint8)
        labels = np.zeros((hi - lo,), np.int32)
        severity = np.zeros((hi - lo,), np.float32)

        def store_row(i):
            """Physical storage row of global sample i: shard-major when
            sharded ([s * rows_per + local] for s = i % dp), identity
            otherwise."""
            if not self.sharded:
                return i
            return (i % self.dp) * rows_per + i // self.dp

        def fill(i):
            r = store_row(i)
            if not lo <= r < hi:
                return                       # another host's shard
            img, lab, sev = first if i == 0 else dataset[i]
            images[r - lo], labels[r - lo], severity[r - lo] = img, lab, sev

        if num_workers > 1 and n > 1:
            # Parallel decode (PIL and the native resize release the GIL) —
            # same pattern as Loader._make_batch.
            with ThreadPoolExecutor(num_workers) as ex:
                list(ex.map(fill, range(n)))
        else:
            for i in range(n):
                fill(i)

        if multihost:
            put = lambda x: jax.make_array_from_process_local_data(  # noqa
                s, x, (n_store, *x.shape[1:]))
        elif mesh is not None:
            put = lambda x: jax.device_put(x, s)           # noqa: E731
        elif device is not None:
            put = lambda x: jax.device_put(x, device)      # noqa: E731
        else:
            put = jnp.asarray
        self._images = put(images)
        self._labels = put(labels)
        self._severity = put(severity)

        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.mesh = mesh
        self._epoch = 0
        self.n = n
        self.rows_per_shard = rows_per
        # Real (non-pad) rows per shard: shard s owns globals s, s+dp, ...
        self._shard_sizes = [len(range(s, n, self.dp))
                             for s in range(self.dp)]

        gather = make_gather(mesh, self.sharded)

        @jax.jit
        def _gather(images, labels, severity, idx, valid):
            return {**gather(images, labels, severity, idx),
                    "valid": valid}

        self._gather = _gather

    def __len__(self):
        if self.sharded:
            bpd = self.batch_size // self.dp
            if self.shuffle or self.drop_last:
                return min(self._shard_sizes) // bpd
            return (max(self._shard_sizes) + bpd - 1) // bpd
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Align the epoch-keyed shuffle stream (resume support)."""
        self._epoch = epoch

    @property
    def nbytes(self) -> int:
        """Global dataset bytes (per-device HBM = nbytes/dp when
        ``shard_data``, nbytes when replicated)."""
        return (self._images.nbytes + self._labels.nbytes
                + self._severity.nbytes)

    @property
    def arrays(self):
        """The device-resident (images, labels, severity) arrays — consumed
        by the scanned-epoch trainer path."""
        return self._images, self._labels, self._severity

    def _epoch_order(self) -> np.ndarray:
        """Advance the epoch counter and return this epoch's sample order
        (shared by __iter__ and epoch_index_plan — exactly one of them runs
        per training epoch)."""
        self._epoch += 1
        order = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(
                epoch_shuffle_seed(self.seed, self._epoch)).shuffle(order)
        return order

    def epoch_index_plan(self) -> np.ndarray:
        """This epoch's shuffled index matrix for the one-dispatch
        ``lax.scan`` training path (full batches only — the Trainer routes
        here only when ``drop_last``). Replicated cache: ``(steps, batch)``
        global ids. Sharded cache: ``(steps, dp, batch/dp)`` per-shard
        LOCAL ids (stratified batches, per-shard shuffle)."""
        if self.sharded:
            return self._sharded_train_plan()
        order = self._epoch_order()
        steps = self.n // self.batch_size
        return order[:steps * self.batch_size].reshape(
            steps, self.batch_size).astype(np.int32)

    def _sharded_train_plan(self) -> np.ndarray:
        self._epoch += 1
        bpd = self.batch_size // self.dp
        steps = min(self._shard_sizes) // bpd
        rng = np.random.RandomState(
            epoch_shuffle_seed(self.seed, self._epoch))
        plan = np.zeros((steps, self.dp, bpd), np.int32)
        for s in range(self.dp):
            order = np.arange(self._shard_sizes[s])
            if self.shuffle:
                rng.shuffle(order)
            plan[:, s, :] = order[:steps * bpd].reshape(steps, bpd)
        return plan

    def _sharded_eval_plan(self, shuffled: bool = False):
        """Full-coverage per-shard plan + valid mask (tails zero-padded).
        ``shuffled`` permutes each shard's order first (epoch-keyed) — the
        shuffle=True, drop_last=False iteration contract."""
        bpd = self.batch_size // self.dp
        steps = (max(self._shard_sizes) + bpd - 1) // bpd
        idx = np.zeros((steps, self.dp, bpd), np.int32)
        valid = np.zeros((steps, self.dp, bpd), np.float32)
        rng = None
        if shuffled:
            self._epoch += 1
            rng = np.random.RandomState(
                epoch_shuffle_seed(self.seed, self._epoch))
        for s in range(self.dp):
            flat = np.arange(self._shard_sizes[s])
            if rng is not None:
                rng.shuffle(flat)
            for st in range(steps):
                chunk = flat[st * bpd:(st + 1) * bpd]
                idx[st, s, :len(chunk)] = chunk
                valid[st, s, :len(chunk)] = 1.0
        return idx, valid

    def eval_index_plan(self):
        """Unshuffled full-coverage ``(steps, batch)`` index plan plus the
        matching ``(steps, batch)`` valid mask (tail zero-padded) for the
        scanned evaluation path. Sharded cache: ``(steps, dp, batch/dp)``
        local ids + matching valid mask."""
        if self.sharded:
            return self._sharded_eval_plan()
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
        if self.sharded:
            # Per-batch host-driven iteration over the same stratified
            # plans the scan paths use (shard-local gathers). drop_last
            # selects the full-batch train plan; otherwise the padded
            # full-coverage plan (shuffled per shard when requested) so
            # no sample is silently dropped.
            if self.drop_last:
                plan = self._sharded_train_plan()
                valid_plan = np.ones(plan.shape, np.float32)
            else:
                plan, valid_plan = self._sharded_eval_plan(
                    shuffled=self.shuffle)
                if not self.shuffle:
                    self._epoch += 1
            for st in range(plan.shape[0]):
                yield dict(self._gather(
                    self._images, self._labels, self._severity,
                    jnp.asarray(plan[st]),
                    jnp.asarray(valid_plan[st].reshape(-1))))
            return
        order = self._epoch_order()
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
                         seed: int = 42, mesh=None,
                         shard_data: bool = False):
    """Build HBM-resident loaders for the standard three splits.
    ``shard_data`` stores each split P("data") over the mesh (1/dp HBM
    per device, shard-local gathers) instead of replicated."""
    train = DeviceLoader(train_ds, batch_size, shuffle=True, drop_last=True,
                         seed=seed, mesh=mesh, shard_data=shard_data)
    val = DeviceLoader(val_ds, batch_size, mesh=mesh, shard_data=shard_data)
    test = DeviceLoader(test_ds, batch_size, mesh=mesh,
                        shard_data=shard_data)
    return train, val, test
