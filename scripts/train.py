#!/usr/bin/env python
"""Train RoViT-KAN end-to-end (reference `/root/reference/scripts/train.py`).

Flags mirror the reference's ``--data_root --seed --output_dir`` (lines
33-40) plus TPU/test conveniences: ``--synthetic`` fabricates a dataset,
``--fast`` shrinks everything for a smoke run, ``--devices`` sizes the
data-parallel mesh.
"""
import argparse
import copy
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=Path, default=Path("data"))
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output_dir", type=Path, default=Path("outputs/train"))
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--preset", default="tiny",
                   choices=["tiny", "small", "base"],
                   help="backbone width preset (DeiT-Tiny/Small/Base; "
                        "kernels + mesh recipes validated at all three)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic dataset under data_root")
    p.add_argument("--synthetic_per_class", type=int, default=None,
                   help="augmented images per class for --synthetic "
                        "(default 64; 1000 ~= the reference's 4k-image "
                        "scale)")
    p.add_argument("--patience", type=int, default=None,
                   help="override config.train.early_stop_patience")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="EMA of params for eval/checkpoint (e.g. 0.999); "
                        "0/absent = off (reference parity)")
    p.add_argument("--checkpoint_min_interval", type=float, default=None,
                   help="min seconds between best-model DISK writes "
                        "(default 0 = write every val improvement; see "
                        "config.train.checkpoint_min_interval_s — for "
                        "large models whose every-epoch 1GB+ serialization "
                        "dominates the epoch)")
    p.add_argument("--fast", action="store_true",
                   help="tiny model + 2 epochs (smoke test)")
    p.add_argument("--devices", type=int, default=-1,
                   help="data-parallel mesh size (-1 = all)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="pipeline stages (GPipe over a 'pipe' mesh axis; "
                        "depth must divide; see docs/SCALING.md)")
    p.add_argument("--pipeline_microbatches", type=int, default=None,
                   help="microbatches per local batch (default "
                        "config.tpu.pipeline_microbatches)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="model-axis size of a 2-D (data x model) mesh; "
                        "shards attention+MLP weights Megatron-style "
                        "(parallel/tensor.py). Total devices = "
                        "data x model")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="with --tensor_parallel: also shard the residual "
                        "stream's token dim over the model axis (Megatron "
                        "SP via GSPMD; parallel/tensor.py::seq_sharding) — "
                        "LN/residual work and activations shard S-ways, "
                        "all-reduces become reduce-scatter + all-gather")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params, grads, optimizer moments "
                        "and EMA over the data axis instead of "
                        "replicating (parallel/fsdp.py; composes with "
                        "--tensor_parallel into the FSDP+TP hybrid)")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="turn every 2nd backbone block's FFN into an "
                        "expert-choice MoE with N experts (models/moe.py; "
                        "0 = dense flagship)")
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="with --moe_experts: shard the stacked expert "
                        "params over an 'expert' mesh axis "
                        "(parallel/tensor.py::moe_param_specs). Total "
                        "devices = data x expert")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (TPU pods auto-detect; "
                        "elsewhere set JAX_COORDINATOR_ADDRESS / "
                        "JAX_NUM_PROCESSES / JAX_PROCESS_ID) and train over "
                        "a mesh spanning every host's devices")
    p.add_argument("--pretrained_npz", type=Path, default=None,
                   help="converted timm/reference weights "
                        "(scripts/convert_checkpoint.py)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the best_model checkpoint in "
                        "output_dir")
    p.add_argument("--profile_dir", type=Path, default=None,
                   help="write a jax.profiler trace of the first epoch here")
    p.add_argument("--device_cache", action="store_true",
                   help="cache the whole dataset in device HBM (pure-XLA "
                        "input pipeline; ~3GB for the full 20k-image set)")
    p.add_argument("--device_cache_sharded", action="store_true",
                   help="implies --device_cache, storing the dataset "
                        "P('data') over the mesh (1/dp HBM per device, "
                        "shard-local gathers, stratified batches + "
                        "per-shard shuffle) instead of replicating it on "
                        "every device")
    p.add_argument("--all_seeds", action="store_true",
                   help="run every seed in config.train.seeds (default "
                        "[42, 123, 999]) and report mean/std test metrics")
    p.add_argument("--matmul_precision", default=None,
                   choices=["bfloat16", "tensorfloat32", "float32"],
                   help="force XLA matmul precision (TPU default truncates "
                        "fp32 operands to bf16 on the MXU; use float32 for "
                        "bit-faithful parity runs at ~1/3 the throughput)")
    args = p.parse_args()

    # Fail fast, before dataset generation / dataloader construction.
    if args.sequence_parallel:
        if args.tensor_parallel <= 1:
            raise SystemExit("--sequence_parallel requires "
                             "--tensor_parallel > 1 (it shards over "
                             "the model axis)")
        if args.pipeline_parallel > 1:
            raise SystemExit("--sequence_parallel composes with the "
                             "GSPMD tensor-parallel path only; the "
                             "pipeline stages run inside shard_map "
                             "where sharding constraints don't apply")
    if args.expert_parallel > 1:
        if args.moe_experts <= 1:
            raise SystemExit("--expert_parallel requires --moe_experts > 1 "
                             "(there must be experts to shard)")
        if args.moe_experts % args.expert_parallel != 0:
            raise SystemExit(f"--moe_experts {args.moe_experts} must be "
                             f"divisible by --expert_parallel "
                             f"{args.expert_parallel}")
        if args.tensor_parallel > 1 or args.pipeline_parallel > 1:
            raise SystemExit("--expert_parallel uses its own "
                             "('data', 'expert') mesh and does not compose "
                             "with --tensor_parallel/--pipeline_parallel")
    if args.fsdp and (args.pipeline_parallel > 1
                      or args.expert_parallel > 1):
        raise SystemExit("--fsdp composes with --tensor_parallel only; "
                         "pipeline/expert parallelism keep their own "
                         "stacked param layouts (parallel/fsdp.py)")
    if args.moe_experts > 1 and args.pipeline_parallel > 1:
        raise SystemExit("--moe_experts does not compose with "
                         "--pipeline_parallel: the GPipe stage scan "
                         "requires identical per-block param structures "
                         "(parallel/pipeline.py), and MoE blocks differ")

    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    if args.cpu:
        jax.config.update("jax_num_cpu_devices", max(args.devices, 1))
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from rovit_kan_tpu.parallel.multihost import (
            maybe_initialize_distributed)
        active = maybe_initialize_distributed()
        print(f"Multi-host: {jax.process_count()} process(es), "
              f"{len(jax.devices())} global device(s)"
              + ("" if active else " (single-process fallback)"))

    import numpy as np
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.data.dataset import create_dataloaders
    from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset
    from rovit_kan_tpu.models.rovit_kan import build_model, count_parameters
    from rovit_kan_tpu.training.trainer import Trainer
    from rovit_kan_tpu.evaluation.evaluator import Evaluator
    from rovit_kan_tpu.results.logger import ExperimentLogger
    from rovit_kan_tpu.parallel.mesh import make_mesh

    # Seeding (reference train.py:22-28); JAX keys derive from --seed below.
    np.random.seed(args.seed)

    config = get_config(args.preset)
    if args.pretrained_npz:
        config.model.pretrained_npz = args.pretrained_npz
    if args.moe_experts > 1:
        config.model.moe_experts = args.moe_experts
    config.paths.checkpoints_dir = args.output_dir / "checkpoints"
    config.paths.results_dir = args.output_dir / "results"
    config.paths.logs_dir = args.output_dir / "logs"
    if args.epochs:
        config.train.epochs = args.epochs
    if args.batch_size:
        config.train.batch_size = args.batch_size
    if args.fast:
        config.data.image_size = 64
        config.train.epochs = args.epochs or 2
        config.train.batch_size = args.batch_size or 8
        config.train.stage_1_epochs = 1
        config.train.stage_2_epochs = 1
        config.train.stage_3_epochs = 1
        config.flags.freeze_backbone_epochs = 1
        config.flags.mixed_precision = False
        config.model.depth = 2
        config.model.embed_dim = 32
        config.model.num_heads = 2
        config.model.hidden_dim = 16
        config.model.kan_layers = [32, 8, 1]
        config.tpu.use_pallas_attention = False
        config.tpu.use_pallas_kan = False

    aug_root = args.data_root / "Augmented Image"
    orig_root = args.data_root / "Original Image"
    if args.patience is not None:
        config.train.early_stop_patience = args.patience
    if args.ema_decay is not None:
        config.train.ema_decay = args.ema_decay
    if args.checkpoint_min_interval is not None:
        config.train.checkpoint_min_interval_s = args.checkpoint_min_interval
    if args.synthetic:
        n = args.synthetic_per_class or (8 if args.fast else 64)
        generate_synthetic_dataset(aug_root, n_per_class=n,
                                   size=config.data.image_size,
                                   class_names=config.data.class_names,
                                   seed=args.seed)
        generate_synthetic_dataset(orig_root, n_per_class=max(n // 2, 2),
                                   size=config.data.image_size,
                                   class_names=config.data.class_names,
                                   seed=args.seed + 1)

    def run_one(seed: int, out_dir: Path):
        cfg = copy.deepcopy(config)
        cfg.paths.checkpoints_dir = out_dir / "checkpoints"
        cfg.paths.results_dir = out_dir / "results"
        cfg.paths.logs_dir = out_dir / "logs"

        train_l, val_l, test_l = create_dataloaders(
            aug_root, orig_root, cfg.data.class_names,
            cfg.data.severity_map, batch_size=cfg.train.batch_size,
            train_val_split=cfg.data.train_val_split, seed=seed,
            image_size=cfg.data.image_size,
            prefetch=cfg.data.prefetch_batches,
            num_workers=cfg.data.num_workers)

        # Focal alpha from train-split class weights (reference
        # train.py:110-111).
        focal_alpha = train_l.dataset.get_class_weights()
        cfg.loss.focal_alpha = focal_alpha.tolist()

        param_specs = None
        model_axes = (args.tensor_parallel * args.pipeline_parallel
                      * args.expert_parallel)
        if args.devices != -1 and args.devices % model_axes != 0:
            # The floor-divides below would silently idle the remainder.
            raise SystemExit(
                f"--devices {args.devices} is not divisible by "
                f"pipeline*tensor*expert parallel = {model_axes}; "
                f"{args.devices % model_axes} device(s) would sit idle")
        if args.tensor_parallel > 1 and args.pipeline_parallel > 1:
            # 3-D dp x pp x tp mesh: the Trainer derives the combined
            # specs (blocks P("pipe", <Megatron rule>)) itself.
            from rovit_kan_tpu.parallel.pipeline import make_pipeline_mesh
            n = args.tensor_parallel * args.pipeline_parallel
            data_ax = -1 if args.devices == -1 else args.devices // n
            mesh = make_pipeline_mesh(data_ax, args.pipeline_parallel,
                                      model=args.tensor_parallel)
            if args.pipeline_microbatches:
                cfg.tpu.pipeline_microbatches = args.pipeline_microbatches
            print(f"Mesh: data={mesh.devices.shape[0]} x "
                  f"pipe={mesh.devices.shape[1]} x "
                  f"model={mesh.devices.shape[2]} (pipeline + tensor "
                  f"parallel, {cfg.tpu.pipeline_microbatches} microbatches)")
        elif args.tensor_parallel > 1:
            from rovit_kan_tpu.parallel.tensor import make_2d_mesh
            # --devices counts TOTAL devices; the data axis is the rest.
            data_ax = (-1 if args.devices == -1
                       else args.devices // args.tensor_parallel)
            mesh = make_2d_mesh(data_ax, args.tensor_parallel)
            param_specs = True    # resolved to a spec tree below
            print(f"Mesh: data={mesh.devices.shape[0]} x "
                  f"model={mesh.devices.shape[1]} (tensor parallel)")
        elif args.pipeline_parallel > 1:
            from rovit_kan_tpu.parallel.pipeline import make_pipeline_mesh
            data_ax = (-1 if args.devices == -1
                       else args.devices // args.pipeline_parallel)
            mesh = make_pipeline_mesh(data_ax, args.pipeline_parallel)
            if args.pipeline_microbatches:
                cfg.tpu.pipeline_microbatches = args.pipeline_microbatches
            print(f"Mesh: data={mesh.devices.shape[0]} x "
                  f"pipe={mesh.devices.shape[1]} (pipeline parallel, "
                  f"{cfg.tpu.pipeline_microbatches} microbatches)")
        elif args.expert_parallel > 1:
            from rovit_kan_tpu.parallel.tensor import make_moe_mesh
            data_ax = (-1 if args.devices == -1
                       else args.devices // args.expert_parallel)
            mesh = make_moe_mesh(data_ax, args.expert_parallel)
            param_specs = "moe"   # resolved to a spec tree below
            print(f"Mesh: data={mesh.devices.shape[0]} x "
                  f"expert={mesh.devices.shape[1]} (expert parallel, "
                  f"{cfg.model.moe_experts} experts)")
        else:
            mesh = make_mesh(args.devices)
            if args.fsdp:
                param_specs = "fsdp"  # resolved to a spec tree below
        if args.fsdp and mesh.devices.shape[0] <= 1:
            # Nothing to shard over; avoid silently switching the
            # optimizer off its flat single-vector fast path.
            print("FSDP: data axis has 1 device — nothing to shard over; "
                  "params stay "
                  + ("tensor-parallel sharded (Megatron specs only)"
                     if param_specs else "replicated"))
            args.fsdp = False
            if param_specs == "fsdp":
                param_specs = None
        elif args.fsdp:
            print(f"FSDP: params/grads/moments/EMA sharded over "
                  f"data={mesh.devices.shape[0]} (ZeRO-3)")
        if args.device_cache or args.device_cache_sharded:
            from rovit_kan_tpu.data.device_cache import device_cache_loaders
            train_l, val_l, test_l = device_cache_loaders(
                train_l.dataset, val_l.dataset, test_l.dataset,
                cfg.train.batch_size, seed=seed, mesh=mesh,
                shard_data=args.device_cache_sharded)
            if train_l.sharded:
                print(f"Device cache: {train_l.nbytes / 1e6:.0f} MB train "
                      f"split in HBM, sharded P('data') — "
                      f"{train_l.nbytes / train_l.dp / 1e6:.0f} MB/device "
                      f"over {train_l.dp}")
            else:
                print(f"Device cache: {train_l.nbytes / 1e6:.0f} MB train "
                      f"split resident in HBM (replicated over "
                      f"{mesh.devices.size} device(s))")
        act_sharding = None
        if args.sequence_parallel:   # prereqs validated at parse time
            from rovit_kan_tpu.parallel.tensor import seq_sharding
            act_sharding = seq_sharding(mesh)
            print("Sequence parallel: residual stream tokens sharded "
                  f"over model={mesh.devices.shape[-1]}")
        model = build_model(cfg, act_sharding=act_sharding)
        logger = ExperimentLogger(cfg.paths.logs_dir, "train")
        specs = None
        if param_specs:
            from rovit_kan_tpu.parallel.tensor import (
                moe_param_specs, param_specs as mk_specs)
            # Structure-only init (eval_shape — no FLOPs, no memory) to
            # derive the spec tree BEFORE constructing the Trainer: the
            # constructor must see param_specs to fall back from the flat
            # single-vector AdamW (whose moments cannot shard) to the
            # per-leaf chain.
            dummy = np.zeros((1, cfg.data.image_size, cfg.data.image_size,
                              3), np.float32)
            shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed),
                                    dummy)["params"]
            if args.fsdp:
                from jax.sharding import PartitionSpec as PSpec

                from rovit_kan_tpu.parallel.fsdp import (
                    fsdp_param_specs, sharded_size)
                specs = fsdp_param_specs(shapes, mesh,
                                         tp=(param_specs is True))
                full = sharded_size(shapes, jax.tree.map(
                    lambda _: PSpec(), shapes), mesh)
                print(f"FSDP state/device: params "
                      f"{sharded_size(shapes, specs, mesh) / 1e6:.1f} MB "
                      f"(replicated: {full / 1e6:.1f} MB); AdamW moments "
                      f"and EMA shard identically")
            else:
                specs = (moe_param_specs(shapes) if param_specs == "moe"
                         else mk_specs(shapes))
        trainer = Trainer(model, train_l, val_l, cfg, logger=logger,
                          focal_alpha=focal_alpha, mesh=mesh, seed=seed,
                          param_specs=specs)

        start_epoch = 1
        ck_dir = cfg.paths.checkpoints_dir
        # A preemption checkpoint (SIGTERM mid-run) is by construction the
        # LATEST state — prefer it over best_model; a completed fit deletes
        # it, so its presence always means "interrupted run". Either name
        # must be a COMMITTED orbax checkpoint: a hard crash mid-write
        # (best_model saves are async) leaves an unfinalized torso that
        # restore would choke on — fall through rather than load it.
        from rovit_kan_tpu.utils.checkpoint import promote_staging
        resume_name = None
        if promote_staging(ck_dir / "preempt_model"):
            resume_name = "preempt_model"
        elif promote_staging(ck_dir / "best_model"):
            resume_name = "best_model"
        elif args.resume and ((ck_dir / "preempt_model").exists()
                              or (ck_dir / "best_model").exists()):
            print("WARNING: checkpoint directory holds only torn "
                  "(unfinalized) checkpoints — starting fresh")
        if args.resume and resume_name:
            state, start_epoch = trainer.resume(resume_name)
            # Epochs the previous process logged past this restore point
            # were discarded by the restore — drop their CSV rows so the
            # resumed lineage doesn't interleave with the stale one.
            dropped = logger.truncate_from(start_epoch)
            if dropped:
                print(f"Dropped {dropped} stale epoch rows past the "
                      f"restore point from {logger.csv_path}")
            print(f"Resumed from epoch {start_epoch - 1} ({resume_name})")
        elif cfg.model.pretrained_npz:
            from rovit_kan_tpu.models.convert import (
                load_npz, merge_pretrained)
            print(f"Loading pretrained weights: "
                  f"{cfg.model.pretrained_npz}")
            pre = load_npz(cfg.model.pretrained_npz)
            # Merge over a CANONICAL-layout init (init_state converts to
            # the pipelined layout itself when applicable).
            base = trainer._init_params(jax.random.PRNGKey(seed))
            state = trainer.init_state(params=merge_pretrained(base, pre))
        else:
            state = trainer.init_state()
        if (not (args.resume and resume_name)) and logger.reset():
            # Fresh run into a directory holding a previous run's CSV:
            # replace it — appending would concatenate two epoch lineages.
            print(f"Replaced previous epoch CSV at {logger.csv_path}")
        print("Parameters:", count_parameters(state.params)["total"])

        if args.profile_dir:
            from rovit_kan_tpu.utils.profiling import trace
            with trace(str(args.profile_dir)):
                state, _ = trainer.train_epoch(state, start_epoch)
            start_epoch += 1
            print(f"Profiler trace written to {args.profile_dir}")

        result = trainer.fit(state, start_epoch=start_epoch)
        if result["preempted"]:
            # The pod is being reclaimed: skip plotting/evaluation (they
            # would be killed mid-way anyway) and tell the caller — a
            # half-trained model must never produce "final" metrics.
            print("Run preempted — skipping final evaluation; "
                  "re-run with --resume to continue")
            return None
        logger.plot_training_curves()

        # Evaluate the same weights model selection and the checkpoint use:
        # the EMA tree when EMA is on, merged back to the canonical layout
        # when the run was pipeline-parallel.
        if (resume_name == "preempt_model" and start_epoch > 1
                and not result["improved"]
                and (ck_dir / "best_model").exists()):
            # Resumed from a preemption checkpoint and no epoch beat the
            # restored best: the in-memory "best_state" is the
            # preemption-time state — the true best lives on disk.
            from rovit_kan_tpu.evaluation.evaluator import (
                load_model_for_evaluation)
            _, eval_weights = load_model_for_evaluation(
                ck_dir / "best_model", cfg)
        else:
            eval_weights = trainer.eval_params(result["best_state"])
            if trainer.pipelined:
                from rovit_kan_tpu.parallel.pipeline import merge_params
                eval_weights = merge_params(eval_weights)
        evaluator = Evaluator(model, eval_weights, test_l,
                              cfg, output_dir=cfg.paths.results_dir)
        return evaluator.evaluate()

    if not args.all_seeds:
        metrics = run_one(args.seed, args.output_dir)
        if metrics is None:       # preempted
            return
        print("Done. Test accuracy:", metrics["accuracy"])
        return

    # Multi-seed sweep (config.train.seeds; the reference records the same
    # seed list in its TrainConfig but never implements the sweep).
    import json
    all_metrics = {}
    for seed in config.train.seeds:
        print(f"===== seed {seed} =====")
        m = run_one(seed, args.output_dir / f"seed_{seed}")
        if m is None:             # preempted — stop the sweep cleanly
            print(f"Sweep preempted at seed {seed}; re-run with --resume")
            return
        all_metrics[seed] = m
    keys = ("accuracy", "macro_f1", "weighted_f1", "mae", "spearman_rho",
            "brier_score", "ece")
    summary = {}
    for k in keys:
        vals = np.asarray([m[k] for m in all_metrics.values()], np.float64)
        summary[k] = {"mean": float(vals.mean()), "std": float(vals.std()),
                      "per_seed": {str(s): float(m[k])
                                   for s, m in all_metrics.items()}}
    (args.output_dir / "seed_summary.json").write_text(
        json.dumps(summary, indent=2))
    print("Seed sweep summary (mean ± std):")
    for k in keys:
        print(f"  {k:14s} {summary[k]['mean']:.4f} ± {summary[k]['std']:.4f}")


if __name__ == "__main__":
    main()
