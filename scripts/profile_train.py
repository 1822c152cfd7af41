#!/usr/bin/env python
"""Profile the flagship train step: stage decomposition + device trace.

Answers the round-2 verdict's open question ("train MFU is 13-16% with an
unexplained inverted batch scaling, and no profile exists") with data:

1. **Stage decomposition** — times, per batch size, each pipeline stage in
   isolation with the same fetch-barriered best-of-chunks discipline as
   bench.py: device_put (H2D), augment chain, forward, forward+backward,
   optimizer update, and the full fused train step. Stage percentages name
   the time sinks directly.
2. **Device trace** (``--trace_dir``) — a ``jax.profiler`` XPlane trace of
   several full steps, converted (when the xprof converter is available)
   into a per-op table; top ops by self time are printed and saved.

Writes one JSON with everything to ``--out``.
"""
from __future__ import annotations

import argparse
import glob
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _chunk_times(run, n_chunks=5):
    ts = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return ts


def _best_ms(run, iters, n_chunks=5):
    return min(_chunk_times(run, n_chunks)) / iters * 1e3


def _measure_full_step(model, config, params, batch, iters):
    """Build optimizer + TrainState, warm the full fused train step, and
    best-of-chunks time it.  Shared by the ``--full_only`` early return
    and the stage-decomposition path so the setup (hyperparams, args3,
    donation pattern) cannot drift between the two (advisor, round 4).

    Returns ``(full_step_ms, handles)`` where handles =
    ``(train_step, carry, batch, args3)`` as needed by capture_trace /
    cost analysis."""
    import jax
    import jax.numpy as jnp
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)
    from rovit_kan_tpu.training.trainer import TrainState, make_train_step

    tx = build_optimizer(config)
    train_step, _ = make_train_step(model, tx, config)
    state = TrainState(
        params=jax.tree.map(jnp.copy, params),
        opt_state=set_hyperparams(tx.init(params), 5e-4, 0.1),
        rng=jax.random.PRNGKey(1),
        step=jnp.zeros((), jnp.int32))
    args3 = (jnp.int32(4), jnp.float32(1.0), jnp.float32(1.0))
    state, m = train_step(state, batch, *args3)
    float(m["total_loss"])
    carry = [state]

    def full_run():
        st = carry[0]
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            st, m = train_step(st, batch, *args3)
            acc = acc + m["total_loss"]
        carry[0] = st
        assert np.isfinite(float(acc))

    return _best_ms(full_run, iters), (train_step, carry, batch, args3)


def profile_batch(batch_size: int, iters: int = 20,
                  force_xla: bool = False,
                  fused_augment=None,
                  full_only: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.models.rovit_kan import build_model
    from rovit_kan_tpu.ops.mixing import cutmix_or_mixup
    from rovit_kan_tpu.ops.preprocess import augment_batch
    from rovit_kan_tpu.training.losses import joint_loss
    from rovit_kan_tpu.training.optimizer import (build_optimizer,
                                                  set_hyperparams)

    config = get_config()
    if force_xla:
        config.tpu.use_pallas_block = False
        config.tpu.use_pallas_attention = False
    if fused_augment is not None:
        config.train.fused_augment = fused_augment
    model = build_model(config, dtype=jnp.bfloat16)
    size = config.data.image_size
    lc = config.loss

    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (1, size, size, 3), jnp.float32)
    params = model.init(key, x1)["params"]

    rng = np.random.RandomState(0)
    host_images = rng.randint(0, 256, (batch_size, size, size, 3),
                              dtype=np.uint8)
    images = jnp.asarray(host_images)
    labels = jnp.asarray(rng.randint(0, 4, (batch_size,)), jnp.int32)
    severity = jnp.asarray(
        rng.randint(0, 4, (batch_size,)).astype(np.float32))
    batch = {"images": images, "labels": labels, "severity": severity}

    out: dict = {"batch_size": batch_size,
                 "compute_path": "xla" if force_xla else "auto"}

    if full_only:
        # Skip the stage decomposition (each stage is its own jit compile
        # — expensive on a cold persistent cache); measure only the full
        # fused train step.  Used for narrow A/Bs like the backward chunk
        # sizer (ROVIT_BLOCK_BWD_BUDGET_MB) where the full step IS the
        # measurement.
        out["full_step_ms"], handles = _measure_full_step(
            model, config, params, batch, iters)
        out["train_ips"] = batch_size / out["full_step_ms"] * 1e3
        return out, handles

    # --- stage: H2D (uint8 batch upload) --------------------------------
    def h2d():
        acc = 0.0
        for _ in range(iters):
            d = jax.device_put(host_images)
            acc += float(d[0, 0, 0, 0])       # fetch barrier per transfer
        assert np.isfinite(acc)

    h2d()                                     # warm
    out["h2d_ms"] = _best_ms(h2d, iters)

    # --- stage: augment + mixup (the pre-model data chain) ---------------
    @jax.jit
    def aug_only(k, imgs, acc):
        xx = augment_batch(k, imgs)
        mixed, la, lb, lam = cutmix_or_mixup(
            jax.random.fold_in(k, 1), xx, labels, True, True, 1.0, 0.2)
        return acc + jnp.sum(mixed.astype(jnp.float32))

    k0 = jax.random.PRNGKey(1)
    float(aug_only(k0, images, jnp.zeros((), jnp.float32)))

    def aug_run():
        acc = jnp.zeros((), jnp.float32)
        for i in range(iters):
            acc = aug_only(jax.random.fold_in(k0, i), images, acc)
        assert np.isfinite(float(acc))

    out["augment_ms"] = _best_ms(aug_run, iters)

    # --- stage: fused-kernel augment + mixup (ops/augment_kernel.py) -----
    if jax.default_backend() == "tpu":
        from rovit_kan_tpu.ops.augment_kernel import fused_augment_batch

        @jax.jit
        def aug_fused(k, imgs, acc):
            xx = fused_augment_batch(k, imgs)
            mixed, la, lb, lam = cutmix_or_mixup(
                jax.random.fold_in(k, 1), xx, labels, True, True, 1.0, 0.2)
            return acc + jnp.sum(mixed.astype(jnp.float32))

        float(aug_fused(k0, images, jnp.zeros((), jnp.float32)))

        def aug_fused_run():
            acc = jnp.zeros((), jnp.float32)
            for i in range(iters):
                acc = aug_fused(jax.random.fold_in(k0, i), images, acc)
            assert np.isfinite(float(acc))

        out["augment_fused_ms"] = _best_ms(aug_fused_run, iters)

    # --- stage: forward (train-mode, dropout on) -------------------------
    @jax.jit
    def fwd(params, xx, k, acc):
        o = model.apply({"params": params}, xx, deterministic=False,
                        rngs={"dropout": k})
        return acc + jnp.sum(o["cls_logits"].astype(jnp.float32))

    xf = jnp.asarray(images, jnp.float32) / 255.0
    float(fwd(params, xf, k0, jnp.zeros((), jnp.float32)))

    def fwd_run():
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = fwd(params, xf, k0, acc)
        assert np.isfinite(float(acc))

    out["forward_ms"] = _best_ms(fwd_run, iters)

    # --- stage: forward + backward (grads, no update) --------------------
    def loss_fn(params, xx, k):
        o = model.apply({"params": params}, xx, deterministic=False,
                        rngs={"dropout": k})
        losses = joint_loss(o, labels, severity, 4,
                            lambda_ord=lc.lambda_ord, mu_unc=lc.mu_unc,
                            nu_kan=lc.nu_kan, focal_gamma=lc.focal_gamma,
                            head_mask=model.head_mask)
        return losses["total_loss"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    l, grads = grad_fn(params, xf, k0)
    float(l)

    @jax.jit
    def fwdbwd_acc(params, xx, k, acc):
        l, g = jax.value_and_grad(loss_fn)(params, xx, k)
        # Consume the grads: without this XLA dead-code-eliminates the
        # entire backward and the stage silently measures forward-only.
        return acc + l + jnp.sum(jax.tree.leaves(g)[0])

    float(fwdbwd_acc(params, xf, k0, jnp.zeros((), jnp.float32)))

    def fb_run():
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            acc = fwdbwd_acc(params, xf, k0, acc)
        assert np.isfinite(float(acc))

    out["fwd_bwd_ms"] = _best_ms(fb_run, iters)

    # --- stage: optimizer update alone -----------------------------------
    tx = build_optimizer(config)
    opt_state = set_hyperparams(tx.init(params), 5e-4, 0.1)

    @jax.jit
    def update_acc(grads, opt_state, params, acc):
        import optax
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        leaf = jax.tree.leaves(new_params)[0]
        return acc + jnp.sum(leaf.astype(jnp.float32)), new_opt

    acc, _ = update_acc(grads, opt_state, params,
                        jnp.zeros((), jnp.float32))
    float(acc)

    def upd_run():
        acc = jnp.zeros((), jnp.float32)
        os = opt_state
        for _ in range(iters):
            acc, os = update_acc(grads, os, params, acc)
        assert np.isfinite(float(acc))

    out["update_ms"] = _best_ms(upd_run, iters)

    # --- full train step --------------------------------------------------
    out["full_step_ms"], handles = _measure_full_step(
        model, config, params, batch, iters)
    train_step, carry, batch, args3 = handles
    out["train_ips"] = batch_size / out["full_step_ms"] * 1e3

    # FLOPs / memory from XLA's own analysis of the compiled step.
    try:
        comp = train_step.lower(carry[0], batch, *args3).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["xla_flops"] = float(ca.get("flops", 0.0))
        out["xla_bytes"] = float(ca.get("bytes accessed", 0.0))
        ma = comp.memory_analysis()
        if ma is not None:
            out["hbm_argument_bytes"] = int(
                getattr(ma, "argument_size_in_bytes", 0))
            out["hbm_temp_bytes"] = int(
                getattr(ma, "temp_size_in_bytes", 0))
    except Exception as e:        # pragma: no cover - relay quirks
        out["cost_analysis_error"] = str(e)

    pct = {k: round(v / out["full_step_ms"] * 100, 1)
           for k, v in out.items()
           if k.endswith("_ms") and k != "full_step_ms"}
    out["pct_of_full"] = pct
    return out, handles


def capture_trace(trace_dir: str, train_step, carry, batch, args3,
                  steps: int = 10) -> dict:
    """XPlane trace of `steps` full train steps + optional op-table."""
    import jax

    info: dict = {"trace_dir": trace_dir}
    jax.profiler.start_trace(trace_dir)
    st = carry[0]
    for _ in range(steps):
        st, m = train_step(st, batch, *args3)
    float(m["total_loss"])
    jax.profiler.stop_trace()
    carry[0] = st

    planes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb",
                              recursive=True))
    info["xplane_files"] = planes
    if not planes:
        return info
    try:
        from xprof.convert import raw_to_tool_data as rtd
        for tool in ("framework_op_stats", "op_profile", "overview_page"):
            try:
                data = rtd.xspace_to_tool_data([planes[-1]], tool, {})
                if isinstance(data, tuple):
                    data = data[0]
                fname = Path(trace_dir) / f"{tool}.out"
                mode = "wb" if isinstance(data, bytes) else "w"
                with open(fname, mode) as f:
                    f.write(data)
                info[tool] = str(fname)
            except Exception as e:
                info[f"{tool}_error"] = str(e)[:200]
    except Exception as e:
        info["converter_error"] = str(e)[:200]
    return info


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[64, 256])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace_dir", default=None,
                   help="also capture an XPlane device trace per batch size")
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--xla", action="store_true",
                   help="force the pure-XLA compute path (kernel policy "
                        "off) to decompose the unfused train step")
    p.add_argument("--no_fused_augment", action="store_true",
                   help="force the XLA augment chain inside the full "
                        "train step (A/B vs ops/augment_kernel.py)")
    p.add_argument("--full_only", action="store_true",
                   help="measure only the full train step (skip the "
                        "per-stage decomposition and its extra compiles)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    results = []
    for bs in args.batches:
        r, handles = profile_batch(
            bs, args.iters, force_xla=args.xla,
            fused_augment=False if args.no_fused_augment else None,
            full_only=args.full_only)
        if args.trace_dir:
            r["trace"] = capture_trace(f"{args.trace_dir}/bs{bs}", *handles)
        results.append(r)
        print(json.dumps(r), flush=True)

    final = {"device": str(jax.devices()[0].device_kind),
             "results": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(final, f, indent=2)


if __name__ == "__main__":
    main()
