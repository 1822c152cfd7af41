"""KAN interpretability: learned spline curves, activation trajectories,
severity distributions, spline weight heatmaps.

Capability parity with `/root/reference/explainability/kan_viz.py:9-215`.
All computation is pure functions of the KAN param subtree (no module state,
no hooks): spline curves evaluate the learned coefficients on a [-1, 1] grid
(ops/spline.py:spline_curve), the per-layer activation trajectory replays
the KAN stack functionally from params.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rovit_kan_tpu.ops.spline import (
    make_knots,
    kan_layer_apply,
    spline_curve,
)


def kan_trajectory(kan_params: Dict, features: jnp.ndarray,
                   num_knots: int = 5, degree: int = 3) -> List[np.ndarray]:
    """Per-layer activations incl. input and final score (functional
    analogue of reference ``KANSeverityModule.get_activation_trajectory``,
    models/kan.py:154-167)."""
    knots = make_knots(num_knots, degree)
    layer_names = sorted((k for k in kan_params if k.startswith("kan_layers_")),
                         key=lambda s: int(s.rsplit("_", 1)[1]))
    acts = [np.asarray(features)]
    x = features
    for i, name in enumerate(layer_names):
        p = kan_params[name]
        x = kan_layer_apply(x, p["spline_weights"], p["kernel"], p["bias"],
                            knots, degree)
        if i < len(layer_names) - 1:
            x = jax.nn.relu(x)
        else:
            x = 3.0 * jax.nn.sigmoid(x)
        acts.append(np.asarray(x))
    return acts


class KANVisualizer:
    """Figure suite for a trained KAN severity module (reference
    kan_viz.py:9-215)."""

    def __init__(self, kan_params: Dict, num_knots: int = 5, degree: int = 3,
                 output_dir: Optional[Path] = None):
        self.kan_params = kan_params
        self.num_knots = num_knots
        self.degree = degree
        self.knots = make_knots(num_knots, degree)
        self.output_dir = Path(output_dir) if output_dir else None
        self.layer_names = sorted(
            (k for k in kan_params if k.startswith("kan_layers_")),
            key=lambda s: int(s.rsplit("_", 1)[1]))

    def _finish(self, fig, name: str):
        import matplotlib.pyplot as plt
        if self.output_dir is not None:
            self.output_dir.mkdir(parents=True, exist_ok=True)
            path = self.output_dir / name
            fig.savefig(path, dpi=120, bbox_inches="tight")
            plt.close(fig)
            return path
        return fig

    def plot_spline_activations(self, layer_idx: int = 0,
                                max_curves: int = 16,
                                name: str = "kan_splines.png"):
        """Grid of learned spline curves phi_ij for one layer (reference
        kan_viz.py:14-56)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        w = np.asarray(
            self.kan_params[self.layer_names[layer_idx]]["spline_weights"])
        in_f, out_f, _ = w.shape
        pairs = [(i, j) for i in range(in_f) for j in range(out_f)]
        # Pick the largest-magnitude splines (most informative curves).
        mags = np.abs(w).sum(-1)
        order = np.argsort(-mags.ravel())[:max_curves]
        pairs = [pairs[k] for k in order]

        cols = 4
        rows = (len(pairs) + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 2.4 * rows),
                                 squeeze=False)
        for ax, (i, j) in zip(axes.flat, pairs):
            x, y = spline_curve(w, self.knots, i, j, degree=self.degree)
            ax.plot(x, y)
            ax.set_title(f"$\\phi_{{{i},{j}}}$", fontsize=9)
            ax.grid(alpha=0.3)
        for ax in axes.flat[len(pairs):]:
            ax.axis("off")
        fig.suptitle(f"KAN layer {layer_idx} learned splines")
        fig.tight_layout()
        return self._finish(fig, name)

    def plot_severity_trajectory(self, features: jnp.ndarray,
                                 severities: np.ndarray,
                                 name: str = "kan_trajectory.png"):
        """Scatter of mean activation between consecutive KAN layers colored
        by severity (reference kan_viz.py:58-123)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        acts = kan_trajectory(self.kan_params, features,
                              self.num_knots, self.degree)
        means = [a.mean(axis=1) for a in acts]              # per-sample means
        n_steps = len(means) - 1
        fig, axes = plt.subplots(1, n_steps, figsize=(4.5 * n_steps, 4),
                                 squeeze=False)
        sc = None
        for s in range(n_steps):
            ax = axes[0, s]
            sc = ax.scatter(means[s], means[s + 1], c=severities,
                            cmap="viridis", s=18, alpha=0.8)
            ax.set_xlabel(f"layer {s} mean act")
            ax.set_ylabel(f"layer {s + 1} mean act")
            ax.grid(alpha=0.3)
        fig.colorbar(sc, ax=axes[0, -1], label="severity")
        fig.suptitle("KAN activation trajectory")
        fig.tight_layout()
        return self._finish(fig, name)

    def plot_severity_distribution(self, severity_pred: np.ndarray,
                                   class_idx: np.ndarray,
                                   class_names: Sequence[str],
                                   name: str = "kan_severity_violin.png"):
        """Per-class violin plot of predicted severities (reference
        kan_viz.py:125-181)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        groups = [np.asarray(severity_pred)[np.asarray(class_idx) == i]
                  for i in range(len(class_names))]
        fig, ax = plt.subplots(figsize=(8, 4.5))
        present = [g for g in groups if g.size > 0]
        pos = [i for i, g in enumerate(groups) if g.size > 0]
        if present:
            ax.violinplot(present, positions=pos, showmedians=True)
        ax.set_xticks(range(len(class_names)))
        ax.set_xticklabels(class_names, rotation=20, ha="right")
        ax.set_ylabel("KAN predicted severity")
        ax.set_title("Severity distribution by class")
        ax.grid(alpha=0.3, axis="y")
        fig.tight_layout()
        return self._finish(fig, name)

    def plot_spline_weights_heatmap(self, name: str = "kan_weights.png"):
        """Basis-averaged |spline weight| heatmap per layer (reference
        kan_viz.py:183-215)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(self.layer_names)
        fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
        for ax, lname in zip(axes[0], self.layer_names):
            w = np.abs(np.asarray(
                self.kan_params[lname]["spline_weights"])).mean(axis=-1)
            im = ax.imshow(w.T, aspect="auto", cmap="viridis")
            ax.set_xlabel("in feature")
            ax.set_ylabel("out feature")
            ax.set_title(lname)
            fig.colorbar(im, ax=ax, fraction=0.046)
        fig.suptitle("KAN spline weight magnitudes (basis-averaged)")
        fig.tight_layout()
        return self._finish(fig, name)
