"""On-device ops: CutMix/MixUp invariants, preprocessing, cosine LR torch
parity, logger CSV format."""
import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovit_kan_tpu.ops.mixing import mixup, cutmix, cutmix_or_mixup
from rovit_kan_tpu.ops.preprocess import (
    to_float, normalize, denormalize, random_flips, augment_batch,
    eval_batch, IMAGENET_MEAN, IMAGENET_STD)
from rovit_kan_tpu.config import get_config
from rovit_kan_tpu.training.optimizer import cosine_lr
from rovit_kan_tpu.results.logger import ExperimentLogger, CSV_COLUMNS


def _imgs(seed=0, bs=8, size=32):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(bs, size, size, 3).astype(np.float32))


def test_mixup_is_convex_combination():
    x = _imgs()
    mixed, perm, lam = mixup(jax.random.PRNGKey(0), x, alpha=0.2)
    want = lam * x + (1 - lam) * x[perm]
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(want), atol=1e-6)
    assert 0.0 <= float(lam) <= 1.0


def test_cutmix_lam_matches_box_area():
    x = _imgs()
    mixed, perm, lam = cutmix(jax.random.PRNGKey(1), x, alpha=1.0)
    # Pixels equal either source or permuted image; lam = kept fraction.
    m = np.asarray(mixed)
    a = np.asarray(x)
    perm = np.asarray(perm)
    # Exclude permutation fixed points (image pasted onto itself is
    # indistinguishable from 'kept').
    moved = perm != np.arange(len(perm))
    from_a = np.isclose(m[moved], a[moved], atol=1e-6).all(axis=-1)
    kept_fraction = from_a.mean()
    assert kept_fraction == pytest.approx(float(lam), abs=0.05)


def test_cutmix_or_mixup_passthrough_when_disabled():
    x = _imgs()
    labels = jnp.arange(8) % 4
    out, la, lb, lam = cutmix_or_mixup(jax.random.PRNGKey(2), x, labels,
                                       use_cutmix=False, use_mixup=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert float(lam) == 1.0
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_cutmix_or_mixup_jit_compatible():
    f = jax.jit(lambda k, x, y: cutmix_or_mixup(k, x, y))
    x = _imgs()
    labels = jnp.arange(8) % 4
    out, la, lb, lam = f(jax.random.PRNGKey(3), x, labels)
    assert out.shape == x.shape


def test_normalize_roundtrip():
    x = _imgs()
    np.testing.assert_allclose(np.asarray(denormalize(normalize(x))),
                               np.asarray(x), atol=1e-5)


def test_normalize_values():
    x = jnp.ones((1, 2, 2, 3))
    got = np.asarray(normalize(x))
    want = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(got[0, 0, 0], want, atol=1e-6)


def test_random_flips_preserve_pixels():
    x = _imgs()
    flipped = random_flips(jax.random.PRNGKey(4), x)
    # Every image is one of the 4 flip variants.
    for i in range(x.shape[0]):
        xi = np.asarray(x[i])
        fi = np.asarray(flipped[i])
        variants = [xi, xi[:, ::-1], xi[::-1], xi[::-1, ::-1]]
        assert any(np.allclose(fi, v) for v in variants)


def test_augment_and_eval_batch_shapes():
    u8 = jnp.asarray((np.asarray(_imgs()) * 255).astype(np.uint8))
    a = augment_batch(jax.random.PRNGKey(5), u8)
    e = eval_batch(u8)
    assert a.shape == e.shape == u8.shape
    assert a.dtype == e.dtype == jnp.float32


def test_cosine_lr_matches_torch_scheduler():
    import torch
    cfg = get_config()
    cfg.train.epochs = 10
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))],
                            lr=cfg.train.learning_rate)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=cfg.train.epochs, eta_min=1e-6)
    for epoch in range(1, cfg.train.epochs + 1):
        torch_lr = opt.param_groups[0]["lr"]
        assert cosine_lr(cfg, epoch) == pytest.approx(torch_lr, rel=1e-6), \
            f"epoch {epoch}"
        sched.step()


def test_logger_csv_schema(tmp_path):
    lg = ExperimentLogger(tmp_path, "t")
    m = {k: 0.5 for k in ("total_loss", "cls_loss", "ord_loss", "unc_loss",
                          "kan_loss", "accuracy")}
    lg.log_epoch(1, 2, m, m)
    lg.log_epoch(2, 3, m, m)
    with open(lg.csv_path) as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == CSV_COLUMNS
    assert len(CSV_COLUMNS) == 14          # reference 14-column schema
    assert [r["epoch"] for r in rows] == ["1", "2"]
    assert lg.plot_training_curves() is not None


def test_logger_truncate_from_drops_stale_resume_rows(tmp_path):
    """A resume re-logs every epoch from its restore point; rows a
    preempted process logged PAST its last checkpoint must be dropped or
    the CSV grows two diverging epoch lineages (seen in the round-4
    preset_base_4k log: epochs 19-23 appeared twice)."""
    lg = ExperimentLogger(tmp_path, "t")
    m = {k: 0.5 for k in ("total_loss", "cls_loss", "ord_loss", "unc_loss",
                          "kan_loss", "accuracy")}
    for e in range(1, 7):
        lg.log_epoch(e, 1, m, m)
    # Checkpoint was at epoch 4 -> resume restarts at 5; epochs 5-6 from
    # the dead process are stale.
    assert lg.truncate_from(5) == 2
    lg.log_epoch(5, 1, m, m)       # the resumed lineage
    with open(lg.csv_path) as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["1", "2", "3", "4", "5"]
    # Idempotent when there is nothing to drop (fresh runs, exact resume).
    assert lg.truncate_from(6) == 0
    # Missing CSV (first run): no-op.
    lg2 = ExperimentLogger(tmp_path / "fresh", "t")
    assert lg2.truncate_from(3) == 0


def test_logger_reset_replaces_previous_lineage(tmp_path):
    """A FRESH (non-resumed) run into a directory with an old CSV must
    replace it, not append a second epoch lineage after it (log_epoch
    appends whenever the file exists)."""
    m = {k: 0.5 for k in ("total_loss", "cls_loss", "ord_loss", "unc_loss",
                          "kan_loss", "accuracy")}
    lg = ExperimentLogger(tmp_path, "t")
    for e in (1, 2, 3):
        lg.log_epoch(e, 1, m, m)
    lg2 = ExperimentLogger(tmp_path, "t")       # fresh process, same dir
    assert lg2.reset() is True
    lg2.log_epoch(1, 1, m, m)
    with open(lg2.csv_path) as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["1"]
    assert lg2.reset() is True          # removes the CSV it just wrote
    assert lg2.reset() is False         # now idempotent: nothing to remove
    # reset on a missing file reports False.
    lg3 = ExperimentLogger(tmp_path / "empty", "t")
    assert lg3.reset() is False


def test_loader_propagates_worker_exception():
    """A failing sample must raise in the consumer, not silently truncate
    the epoch (prefetch worker forwards exceptions)."""
    from rovit_kan_tpu.data.dataset import Loader

    class BadDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise IOError("corrupt image")
            return np.zeros((8, 8, 3), np.uint8), 0, 0.0

    loader = Loader(BadDataset(), batch_size=2, prefetch=2, num_workers=1)
    with pytest.raises(IOError, match="corrupt image"):
        list(loader)


def test_device_loader_matches_host_loader():
    """DeviceLoader yields the same samples as the host Loader contract:
    fixed shapes, valid-masked tail, full coverage each epoch."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader

    class TinyDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            img = np.full((8, 8, 3), i, np.uint8)
            return img, i % 4, float(i % 4)

    dl = DeviceLoader(TinyDS(), batch_size=4)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    seen = []
    for b in batches:
        assert b["images"].shape == (4, 8, 8, 3)
        v = np.asarray(b["valid"]).astype(bool)
        seen.extend(np.asarray(b["images"])[v][:, 0, 0, 0].tolist())
        # labels/severity consistent with image content
        np.testing.assert_array_equal(np.asarray(b["labels"])[v] % 4,
                                      np.asarray(b["labels"])[v])
    assert sorted(seen) == list(range(10))
    # Last batch padded: 2 valid rows.
    assert float(np.asarray(batches[-1]["valid"]).sum()) == 2.0

    # Shuffled loader still covers everything, different order per epoch.
    dls = DeviceLoader(TinyDS(), batch_size=5, shuffle=True, seed=1)
    e1 = np.concatenate([np.asarray(b["images"])[:, 0, 0, 0]
                         for b in dls])
    e2 = np.concatenate([np.asarray(b["images"])[:, 0, 0, 0]
                         for b in dls])
    assert sorted(e1.tolist()) == sorted(e2.tolist()) == list(range(10))
    assert not np.array_equal(e1, e2)


def test_loader_abandoned_iterator_does_not_leak():
    """Breaking out of iteration mid-epoch must stop the prefetch worker
    (no thread blocked forever on a full queue)."""
    import threading
    from rovit_kan_tpu.data.dataset import Loader

    class SlowDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.zeros((8, 8, 3), np.uint8), 0, 0.0

    before = threading.active_count()
    loader = Loader(SlowDS(), batch_size=2, prefetch=2, num_workers=1)
    it = iter(loader)
    next(it)
    it.close()                      # abandon mid-epoch (triggers finally)
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_epoch_shuffle_seed_decorrelated():
    """seed 42/epoch 3 must NOT replay seed 43/epoch 2 (the naive
    ``seed + epoch`` fold collides); same (seed, epoch) stays deterministic,
    and Loader/DeviceLoader share one plan."""
    from rovit_kan_tpu.data.dataset import Loader, epoch_shuffle_seed
    from rovit_kan_tpu.data.device_cache import DeviceLoader

    assert epoch_shuffle_seed(42, 3) != epoch_shuffle_seed(43, 2)
    assert epoch_shuffle_seed(42, 3) == epoch_shuffle_seed(42, 3)

    class SeqDS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.full((4, 4, 3), i, np.uint8), 0, 0.0

    def order_of(loader):
        return np.concatenate([np.asarray(b["images"])[:, 0, 0, 0]
                               for b in loader]).tolist()

    a = Loader(SeqDS(), 4, shuffle=True, seed=42, prefetch=0)
    b = Loader(SeqDS(), 4, shuffle=True, seed=43, prefetch=0)
    a.set_epoch(2)   # next epoch -> 3
    b.set_epoch(1)   # next epoch -> 2
    assert order_of(a) != order_of(b)

    h = Loader(SeqDS(), 4, shuffle=True, seed=7, prefetch=0)
    d = DeviceLoader(SeqDS(), 4, shuffle=True, seed=7)
    assert order_of(h) == order_of(d)


def test_create_dataloaders_transform_and_workers(tmp_path):
    """Reference call contract (scripts/train.py:73-84): host-side
    augmented/original transforms apply per image; num_workers reaches the
    loaders."""
    from rovit_kan_tpu.data.dataset import create_dataloaders
    from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset

    classes = ["Healthy Leaf", "Black Spot"]
    sev = {"Healthy Leaf": 0, "Black Spot": 2}
    generate_synthetic_dataset(tmp_path / "aug", n_per_class=4, size=16,
                               class_names=classes, seed=0)
    generate_synthetic_dataset(tmp_path / "orig", n_per_class=2, size=16,
                               class_names=classes, seed=1)

    marker = np.uint8(7)

    def aug_t(img):
        img = img.copy(); img[0, 0, 0] = marker; return img

    def orig_t(img):
        img = img.copy(); img[0, 0, 0] = marker + 1; return img

    train_l, val_l, test_l = create_dataloaders(
        tmp_path / "aug", tmp_path / "orig", classes, sev, batch_size=4,
        image_size=16, prefetch=0, num_workers=2,
        augmented_transform=aug_t, original_transform=orig_t)
    assert train_l.num_workers == val_l.num_workers == 2
    tb = next(iter(train_l))
    assert np.all(np.asarray(tb["images"])[:, 0, 0, 0] == marker)
    eb = next(iter(test_l))
    assert np.all(np.asarray(eb["images"])[:, 0, 0, 0] == marker + 1)


def test_flat_adamw_matches_per_leaf_chain():
    """The single-flat-vector AdamW (fused_optimizer) must reproduce the
    per-leaf optax chain element-for-element: clipping (incl. a step that
    triggers it), Adam bias correction, decoupled weight decay, the
    backbone LR group, and the frozen (backbone_scale=0) regime."""
    import optax
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)

    rng = np.random.RandomState(0)

    def tree(scale=1.0):
        return {
            "backbone": {"w": jnp.asarray(rng.normal(0, scale, (7, 5)),
                                          jnp.float32),
                         "b": jnp.asarray(rng.normal(0, scale, (5,)),
                                          jnp.float32)},
            "head": {"k": jnp.asarray(rng.normal(0, scale, (5, 3)),
                                      jnp.float32)},
        }

    cfg = get_config()
    params_f = tree()
    params_c = jax.tree.map(jnp.copy, params_f)
    tx_f = build_optimizer(cfg, flat=True)
    tx_c = build_optimizer(cfg, flat=False)
    st_f = tx_f.init(params_f)
    st_c = tx_c.init(params_c)

    for step, (lr, bb, gscale) in enumerate(
            [(1e-4, 0.1, 1.0), (1e-4, 0.0, 1.0),      # frozen backbone
             (5e-4, 0.1, 50.0),                       # triggers clipping
             (5e-4, 0.1, 1.0), (1e-3, 0.1, 0.01)]):
        st_f = set_hyperparams(st_f, lr, bb)
        st_c = set_hyperparams(st_c, lr, bb)
        grads = tree(gscale)
        up_f, st_f = tx_f.update(grads, st_f, params_f)
        up_c, st_c = tx_c.update(grads, st_c, params_c)
        params_f = optax.apply_updates(params_f, up_f)
        params_c = optax.apply_updates(params_c, up_c)
        for a, b in zip(jax.tree.leaves(params_f),
                        jax.tree.leaves(params_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-6,
                                       err_msg=f"step {step}")
