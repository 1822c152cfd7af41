#!/usr/bin/env python
"""Explainability batch driver (reference `/root/reference/scripts/
visualize.py` — bit-rotted there, see SURVEY.md §2.15; this implements the
intended behavior against the real APIs): per-sample attention rollout and
Grad-CAM++ overlays, one-off KAN spline/trajectory/violin/heatmap figures,
plus a summary grid."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--data_root", type=Path, default=Path("data"))
    p.add_argument("--output_dir", type=Path, default=Path("outputs/viz"))
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    from rovit_kan_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.data.dataset import RoseLeafDataset
    from rovit_kan_tpu.evaluation.evaluator import load_model_for_evaluation
    from rovit_kan_tpu.explainability import (
        ViTAttentionRollout, GradCAMPlusPlus, KANVisualizer)
    from rovit_kan_tpu.explainability.attention_maps import overlay_heatmap
    from rovit_kan_tpu.ops.preprocess import eval_batch

    config = get_config()
    config.data.image_size = args.image_size
    out = args.output_dir
    out.mkdir(parents=True, exist_ok=True)

    model, params = load_model_for_evaluation(args.checkpoint, config)
    size = model.image_size

    ds = RoseLeafDataset(args.data_root / "Original Image",
                         config.data.class_names, config.data.severity_map,
                         image_size=size)
    n = min(args.num_samples, len(ds))
    # Spread samples across classes.
    idxs = np.linspace(0, len(ds) - 1, n).astype(int)
    images = np.stack([ds[i][0] for i in idxs])
    labels = np.array([ds[i][1] for i in idxs])

    x = eval_batch(jnp.asarray(images))

    # Per-sample attention rollout + Grad-CAM++ (batched compute).
    roller = ViTAttentionRollout(model, params)
    attn_maps = roller.generate(x)
    gc = GradCAMPlusPlus(model, params)
    cams = gc.compute(x, class_idx=labels)
    preds = np.asarray(model.apply({"params": params}, x,
                                   deterministic=True)["cls_logits"]).argmax(1)

    # Each figure step is error-isolated so one failure doesn't kill the
    # batch (reference scripts/visualize.py:207-264 wraps every method).
    def guarded(desc, fn):
        try:
            fn()
        except Exception as e:
            print(f"  [visualize] {desc} failed: {type(e).__name__}: {e}")

    for j in range(n):
        cname = config.data.class_names[labels[j]]
        guarded(f"attention {j}", lambda j=j, cname=cname: roller.visualize(
            images[j], attn_maps[j],
            save_path=out / f"attention_{j:02d}.png",
            title=f"{cname} (pred: "
                  f"{config.data.class_names[preds[j]]})"))
        guarded(f"gradcam {j}", lambda j=j, cname=cname: gc.visualize(
            images[j], cams[j], save_path=out / f"gradcam_{j:02d}.png",
            title=cname))

    # Summary grid: image / rollout overlay / gradcam overlay per sample.
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(n, 3, figsize=(10, 3.2 * n), squeeze=False)
    for j in range(n):
        img = images[j] / 255.0
        axes[j][0].imshow(img)
        axes[j][0].set_ylabel(config.data.class_names[labels[j]], fontsize=8)
        axes[j][1].imshow(overlay_heatmap(img, attn_maps[j]))
        axes[j][2].imshow(overlay_heatmap(img, cams[j]))
        for ax in axes[j]:
            ax.set_xticks([])
            ax.set_yticks([])
    axes[0][0].set_title("Original")
    axes[0][1].set_title("Attention rollout")
    axes[0][2].set_title("Grad-CAM++")
    fig.tight_layout()
    fig.savefig(out / "summary_grid.png", dpi=120, bbox_inches="tight")
    plt.close(fig)

    # KAN figures (once per run) — only when the model has a KAN head.
    if getattr(model, "with_kan", False):
        outs = model.apply({"params": params}, x, deterministic=True)
        viz = KANVisualizer(params["kan_module"],
                            num_knots=model.kan_num_knots,
                            degree=model.kan_degree,
                            output_dir=out)
        guarded("kan splines", viz.plot_spline_activations)
        guarded("kan trajectory", lambda: viz.plot_severity_trajectory(
            outs["features"], labels))
        guarded("kan violin", lambda: viz.plot_severity_distribution(
            np.asarray(outs["kan_severity"][:, 0]), labels,
            config.data.class_names))
        guarded("kan heatmap", viz.plot_spline_weights_heatmap)

    print(f"Wrote {len(list(out.glob('*.png')))} figures to {out}")


if __name__ == "__main__":
    main()
