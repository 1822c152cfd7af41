"""Trainer semantics: curriculum knobs, freeze, resume, step timing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rovit_kan_tpu.config import get_config
from rovit_kan_tpu.models.rovit_kan import RoViTKAN
from rovit_kan_tpu.training.trainer import Trainer
from rovit_kan_tpu.training.optimizer import cosine_lr
from rovit_kan_tpu.parallel.mesh import make_mesh, shard_batch


class _FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter([dict(b) for b in self.batches])

    def __len__(self):
        return len(self.batches)


def _cfg(tmp):
    cfg = get_config()
    cfg.data.image_size = 32
    cfg.train.batch_size = 8
    cfg.train.epochs = 4
    cfg.train.stage_1_epochs = 1
    cfg.train.stage_2_epochs = 2
    cfg.train.stage_3_epochs = 3
    cfg.flags.freeze_backbone_epochs = 1
    cfg.flags.mixed_precision = False
    cfg.paths.checkpoints_dir = tmp / "ckpt"
    return cfg


def _model():
    return RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                    patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                    use_pallas_attention=False, use_pallas_kan=False)


def _batches(n=2, bs=8):
    rng = np.random.RandomState(0)
    return [{
        "images": rng.randint(0, 256, (bs, 32, 32, 3)).astype(np.uint8),
        "labels": rng.randint(0, 4, (bs,)).astype(np.int32),
        "severity": rng.randint(0, 4, (bs,)).astype(np.float32),
        "valid": np.ones(bs, np.float32),
    } for _ in range(n)]


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trainer")
    cfg = _cfg(tmp)
    batches = _batches()
    return Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                   cfg, mesh=make_mesh(1), seed=0)


def test_epoch_knobs_curriculum(trainer):
    assert trainer._epoch_knobs(1)[0] == 1
    assert trainer._epoch_knobs(2)[0] == 2
    assert trainer._epoch_knobs(3)[0] == 3
    assert trainer._epoch_knobs(4)[0] == 4
    # Frozen during epoch 1 (freeze_backbone_epochs=1), live after.
    assert trainer._epoch_knobs(1)[3] == 0.0
    assert trainer._epoch_knobs(2)[3] == 1.0


def test_cosine_lr_schedule(trainer):
    cfg = trainer.config
    assert cosine_lr(cfg, 1) == pytest.approx(cfg.train.learning_rate)
    # Torch CosineAnnealingLR: min at epoch T_max+1; at the last trained
    # epoch the LR is still above eta_min.
    lrs = [cosine_lr(cfg, e) for e in range(1, cfg.train.epochs + 1)]
    assert all(a > b for a, b in zip(lrs, lrs[1:]))
    assert lrs[-1] > 1e-6


def test_frozen_backbone_params_unchanged(trainer):
    state = trainer.init_state()
    batch = shard_batch({k: v for k, v in _batches(1)[0].items()
                         if k != "valid"}, trainer.mesh)
    before = jax.tree.map(np.asarray, state.params)
    state2, _ = trainer.train_step(state, batch, jnp.int32(1),
                                   jnp.float32(0.0), jnp.float32(1.0))
    after = state2.params
    # Backbone untouched, heads updated.
    bb_deltas = [np.abs(np.asarray(a) - b).max() for a, b in zip(
        jax.tree.leaves(after["backbone"]),
        jax.tree.leaves(before["backbone"]))]
    head_deltas = [np.abs(np.asarray(a) - b).max() for a, b in zip(
        jax.tree.leaves(after["classification_head"]),
        jax.tree.leaves(before["classification_head"]))]
    assert max(bb_deltas) == 0.0
    assert max(head_deltas) > 0.0


def test_fit_and_resume(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.train.epochs = 2
    batches = _batches()
    tr = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)
    res = tr.fit()
    assert len(res["history"]["train"]) == 2
    assert "images_per_sec" in res["history"]["train"][0]

    tr2 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg, mesh=make_mesh(1), seed=0)
    state, next_epoch = tr2.resume()
    assert next_epoch >= 2
    assert tr2.best_val_loss == pytest.approx(res["best_val_loss"])
    # Continue one more epoch without error.
    cfg.train.epochs = next_epoch
    out = tr2.fit(state, start_epoch=next_epoch)
    assert len(out["history"]["train"]) == 1


def test_checkpoint_cooldown_defers_then_flushes_best(tmp_path,
                                                      monkeypatch):
    """With checkpoint_min_interval_s the disk write is throttled (the
    86.5M base preset spent ~100 s/epoch re-serializing 1.2 GB on every
    val improvement) but the on-disk best_model after fit() must still
    be the TRUE best epoch — the deferred pending best is flushed at
    completion."""
    from rovit_kan_tpu.utils import checkpoint as ck

    cfg = _cfg(tmp_path)
    cfg.train.epochs = 3
    cfg.train.checkpoint_min_interval_s = 1e9    # never inside this fit
    batches = _batches()
    tr = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)

    saves = []
    real_save = ck.save_checkpoint

    def spy(path, *a, **k):
        saves.append(str(path))
        return real_save(path, *a, **k)

    monkeypatch.setattr(ck, "save_checkpoint", spy)
    res = tr.fit()
    best_writes = [s for s in saves if s.endswith("best_model")]
    # First improvement writes immediately (cooldown clock starts at
    # -inf); later improvements defer; completion flushes exactly one
    # pending best.
    assert len(best_writes) <= 2, best_writes
    # The flushed checkpoint IS the best epoch: its recorded loss matches
    # fit's best_val_loss.
    meta = ck.load_meta(cfg.paths.checkpoints_dir / "best_model")
    assert meta["best_val_loss"] == pytest.approx(res["best_val_loss"],
                                                  rel=1e-6)

    # And resume() restores it cleanly.
    tr2 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg, mesh=make_mesh(1), seed=0)
    _, next_epoch = tr2.resume()
    assert tr2.best_val_loss == pytest.approx(res["best_val_loss"])
    assert next_epoch >= 2


def test_pos_embed_interpolation():
    from rovit_kan_tpu.models.convert import interpolate_pos_embed
    pe = np.random.RandomState(0).randn(1, 1 + 196, 8).astype(np.float32)
    out = interpolate_pos_embed(pe, 1 + 49)         # 14x14 -> 7x7
    assert out.shape == (1, 50, 8)
    # CLS position untouched; identity when grids match.
    np.testing.assert_array_equal(out[:, 0], pe[:, 0])
    np.testing.assert_array_equal(interpolate_pos_embed(pe, 197), pe)


def test_grad_accumulation_matches_large_batch(tmp_path):
    """accum_steps=2 over two half-batch grads == one full-batch update
    (pure optimizer semantics — no model compile needed)."""
    import jax.numpy as jnp
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)

    cfg = _cfg(tmp_path)
    rng = np.random.RandomState(0)
    params = {"backbone": {"w": jnp.asarray(rng.randn(6, 4), jnp.float32)},
              "head": {"w": jnp.asarray(rng.randn(4), jnp.float32)}}
    g1 = jax.tree.map(lambda p: jnp.asarray(
        rng.randn(*p.shape), jnp.float32), params)
    g2 = jax.tree.map(lambda p: jnp.asarray(
        rng.randn(*p.shape), jnp.float32), params)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    # Full batch, accum 1.
    cfg.train.accum_steps = 1
    tx1 = build_optimizer(cfg)
    o1 = set_hyperparams(tx1.init(params), 1e-4, 0.1)
    up_full, _ = tx1.update(g_mean, o1, params)

    # Two half batches, accum 2.
    cfg.train.accum_steps = 2
    tx2 = build_optimizer(cfg)
    o2 = set_hyperparams(tx2.init(params), 1e-4, 0.1)
    up0, o2 = tx2.update(g1, o2, params)
    assert max(float(jnp.abs(x).max())
               for x in jax.tree.leaves(up0)) == 0.0   # no update yet
    up_acc, _ = tx2.update(g2, o2, params)

    for a, b in zip(jax.tree.leaves(up_full), jax.tree.leaves(up_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scanned_epoch_matches_per_batch_path(tmp_path):
    """DeviceLoader (one-dispatch lax.scan epoch) must produce the same
    losses as the host-loader per-batch path: same shuffle plan, same RNG
    stream, same math."""
    from rovit_kan_tpu.data.device_cache import DeviceLoader

    class ArrayDS:
        def __init__(self, n=16):
            rng = np.random.RandomState(0)
            self.imgs = rng.randint(0, 256, (n, 32, 32, 3)).astype(np.uint8)
            self.labels = rng.randint(0, 4, n)
            self.sev = self.labels.astype(np.float32)

        def __len__(self):
            return len(self.imgs)

        def __getitem__(self, i):
            return self.imgs[i], int(self.labels[i]), float(self.sev[i])

        def get_class_weights(self):
            return np.ones(4, np.float32)

    ds = ArrayDS()
    cfg = _cfg(tmp_path)
    cfg.train.epochs = 2
    cfg.paths.checkpoints_dir = tmp_path / "a"

    from rovit_kan_tpu.data.dataset import Loader
    host_train = Loader(ds, 8, shuffle=True, drop_last=True, seed=7,
                        prefetch=0)
    host_val = Loader(ds, 8)
    tr_host = Trainer(_model(), host_train, host_val, cfg,
                      mesh=make_mesh(1), seed=3)
    res_host = tr_host.fit()

    cfg2 = _cfg(tmp_path)
    cfg2.train.epochs = 2
    cfg2.paths.checkpoints_dir = tmp_path / "b"
    dev_train = DeviceLoader(ds, 8, shuffle=True, drop_last=True, seed=7)
    dev_val = DeviceLoader(ds, 8)
    tr_dev = Trainer(_model(), dev_train, dev_val, cfg2,
                     mesh=make_mesh(1), seed=3)
    res_dev = tr_dev.fit()

    for e in range(2):
        h = res_host["history"]["train"][e]
        d = res_dev["history"]["train"][e]
        assert d["total_loss"] == pytest.approx(h["total_loss"], rel=1e-5)
        hv = res_host["history"]["val"][e]
        dv = res_dev["history"]["val"][e]
        assert dv["total_loss"] == pytest.approx(hv["total_loss"], rel=1e-5)
        assert dv["accuracy"] == pytest.approx(hv["accuracy"], abs=1e-6)


def test_resume_with_grad_accumulation(tmp_path):
    """Optimizer-state restore must preserve optax.MultiSteps structure
    (leaf-order unflattening scrambles its non-alphabetical fields)."""
    cfg = _cfg(tmp_path)
    cfg.train.epochs = 1
    cfg.train.accum_steps = 2
    batches = _batches()
    tr = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)
    res = tr.fit()

    tr2 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg, mesh=make_mesh(1), seed=0)
    state, next_epoch = tr2.resume()
    # Structure must match a fresh init (NamedTuple fields intact) ...
    fresh = tr2.tx.init(state.params)
    assert jax.tree.structure(state.opt_state) == jax.tree.structure(fresh)
    # ... and a further training step must run.
    cfg.train.epochs = next_epoch
    out = tr2.fit(state, start_epoch=next_epoch)
    assert np.isfinite(out["history"]["train"][0]["total_loss"])


def test_ema_params_track_and_evaluate(tmp_path):
    """With ema_decay on: the EMA tree lags the live params, validation +
    the best checkpoint use it, and the evaluator loader prefers it."""
    cfg = _cfg(tmp_path)
    cfg.train.epochs = 2
    cfg.train.ema_decay = 0.5
    batches = _batches()
    tr = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)
    state = tr.init_state()
    p0 = jax.tree.map(np.asarray, state.params)
    assert state.ema_params is not None
    res = tr.fit(state)
    final = res["state"]

    # EMA != live params, and EMA stayed closer to the init than live did
    # (it is a trailing average seeded at p0).
    leaf = lambda t: np.asarray(
        jax.tree_util.tree_leaves(t)[0], np.float32)
    l0, l_live, l_ema = leaf(p0), leaf(final.params), leaf(final.ema_params)
    assert not np.allclose(l_live, l_ema)
    assert np.abs(l_ema - l0).mean() < np.abs(l_live - l0).mean()

    # eval_params selects the EMA tree.
    np.testing.assert_array_equal(leaf(Trainer.eval_params(final)), l_ema)

    # The checkpoint carries ema_params and the evaluator loads them.
    from rovit_kan_tpu.evaluation.evaluator import load_model_for_evaluation
    _, loaded = load_model_for_evaluation(
        cfg.paths.checkpoints_dir / "best_model", cfg)
    saved_ema = tr.load_checkpoint()["ema_params"]
    np.testing.assert_array_equal(leaf(loaded), leaf(saved_ema))

    # Resume restores the EMA tree.
    tr2 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg, mesh=make_mesh(1), seed=0)
    state2, _ = tr2.resume()
    assert state2.ema_params is not None


def test_ema_off_is_structurally_inert(tmp_path):
    """Default config: ema_params stays None end-to-end and checkpoints
    have no ema entry."""
    cfg = _cfg(tmp_path)
    cfg.train.epochs = 1
    batches = _batches()
    tr = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)
    res = tr.fit()
    assert res["state"].ema_params is None
    assert "ema_params" not in tr.load_checkpoint()


def test_ema_resume_across_flag_mismatch(tmp_path):
    """A checkpoint written without EMA resumes under an EMA config with
    its optimizer moments intact (EMA seeded from params), and vice versa."""
    cfg = _cfg(tmp_path)
    cfg.train.epochs = 1
    batches = _batches()
    tr = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)
    tr.fit()                                     # non-EMA checkpoint

    cfg_ema = _cfg(tmp_path)
    cfg_ema.train.ema_decay = 0.9
    tr2 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg_ema, mesh=make_mesh(1), seed=0)
    state2, _ = tr2.resume()
    assert state2.ema_params is not None         # seeded from params
    # Adam moments survived (a fresh init would be all-zero).
    moments = [np.asarray(x) for x in
               jax.tree_util.tree_leaves(state2.opt_state)
               if hasattr(x, "shape") and np.asarray(x).size > 1]
    assert any(np.abs(m).sum() > 0 for m in moments)

    # EMA checkpoint -> non-EMA config: params + moments restore, EMA off.
    tr3 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg_ema, mesh=make_mesh(1), seed=0)
    st = tr3.init_state()
    tr3.save_checkpoint(st, 1, {})
    tr4 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  _cfg(tmp_path), mesh=make_mesh(1), seed=0)
    state4, _ = tr4.resume()
    assert state4.ema_params is None


def test_ema_freezes_on_accumulation_microsteps(tmp_path):
    """With accum_steps=2 the EMA only moves on the micro-steps where
    MultiSteps actually applies an update."""
    from rovit_kan_tpu.training.trainer import TrainState, make_train_step
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)

    cfg = _cfg(tmp_path)
    cfg.train.accum_steps = 2
    cfg.train.ema_decay = 0.5
    model = _model()
    tx = build_optimizer(cfg)
    step, _ = make_train_step(model, tx, cfg)
    b = _batches(1)[0]; b.pop("valid")
    b = {k: jnp.asarray(v) for k, v in b.items()}
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    state = TrainState(params=params,
                       opt_state=set_hyperparams(tx.init(params), 1e-3, 0.1),
                       rng=jax.random.PRNGKey(1),
                       step=jnp.zeros((), jnp.int32),
                       ema_params=jax.tree.map(jnp.copy, params))
    leaf = lambda t: np.asarray(jax.tree_util.tree_leaves(t)[0])
    e0 = leaf(state.ema_params).copy()
    state, _ = step(state, b, jnp.int32(1), jnp.float32(1.0),
                    jnp.float32(0.0))
    # Micro-step 1 of 2: no apply -> EMA unchanged.
    np.testing.assert_array_equal(leaf(state.ema_params), e0)
    state, _ = step(state, b, jnp.int32(1), jnp.float32(1.0),
                    jnp.float32(0.0))
    # Micro-step 2: update applied -> EMA moved.
    assert not np.array_equal(leaf(state.ema_params), e0)


def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-fit -> the CURRENT state is saved as preempt_model at
    the epoch boundary, fit returns preempted=True, a resume continues
    from the preempted epoch, and a completed fit deletes the stale
    preemption checkpoint (so --resume can't pick up an old state)."""
    import os
    import signal

    cfg = _cfg(tmp_path)
    cfg.train.epochs = 4
    batches = _batches()

    class _SignalingLoader(_FakeLoader):
        """Sends SIGTERM from the main thread during the 2nd epoch's
        iteration — deterministic: the handler runs at the next bytecode."""
        def __init__(self, b):
            super().__init__(b)
            self.epoch = 0

        def __iter__(self):
            self.epoch += 1
            if self.epoch == 2:
                os.kill(os.getpid(), signal.SIGTERM)
            return super().__iter__()

    tr = Trainer(_model(), _SignalingLoader(batches), _FakeLoader(batches),
                 cfg, mesh=make_mesh(1), seed=0)
    res = tr.fit()
    assert res["preempted"] is True
    assert len(res["history"]["train"]) == 2          # stopped after ep 2
    assert (tmp_path / "ckpt" / "preempt_model").exists()
    # The default handler is restored (the test process must not die on a
    # later SIGTERM from, e.g., pytest-timeout).
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler)

    # Resume from the preemption checkpoint: continues at epoch 3.
    tr2 = Trainer(_model(), _FakeLoader(batches), _FakeLoader(batches),
                  cfg, mesh=make_mesh(1), seed=0)
    state, next_epoch = tr2.resume("preempt_model")
    assert next_epoch == 3
    assert tr2.best_val_loss == pytest.approx(res["best_val_loss"])
    out = tr2.fit(state, start_epoch=next_epoch)
    assert out["preempted"] is False
    assert len(out["history"]["train"]) == 2          # epochs 3..4
    # Clean completion removed the stale preemption checkpoint.
    assert not (tmp_path / "ckpt" / "preempt_model").exists()


def test_make_train_step_tpu_auto_policy_resolves(monkeypatch, tmp_path):
    """Regression: with the backend reporting "tpu" and mixed_precision on,
    the fused-augment "auto" policy must read config.FLAGS.mixed_precision
    (the field's home). It previously read config.train.mixed_precision,
    which only real-TPU builds evaluate (the `and` short-circuits on CPU)
    — so every TPU training build crashed at make_train_step time while
    the whole CPU suite stayed green (caught live by bench.py's partial
    JSON on the round-4 TPU run)."""
    import optax

    from rovit_kan_tpu.training.trainer import make_train_step

    cfg = _cfg(tmp_path)
    cfg.flags.mixed_precision = True      # TPU default
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    step, eval_step = make_train_step(_model(), optax.sgd(1e-3), cfg)
    assert callable(step)
