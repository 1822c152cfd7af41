#!/usr/bin/env python
"""Export a trained checkpoint to a self-contained StableHLO serving
artifact (weights baked in; loads with `rovit_kan_tpu.export.load_exported`
and no model code). The TPU-native replacement for shipping the
reference's pickled torch state_dict."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path,
                   help="Orbax checkpoint dir (e.g. outputs/checkpoints/"
                        "best_model)")
    p.add_argument("out", type=Path, help="output artifact path (.stablehlo)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms, e.g. tpu cpu (default: "
                        "current backend)")
    p.add_argument("--verify", action="store_true",
                   help="reload the artifact and check outputs against the "
                        "live model on random inputs")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--temperature", type=float, default=None,
                   help="calibration temperature baked into the artifact "
                        "(softmax(logits/T); argmax unchanged). Default: "
                        "the value stored in the checkpoint sidecar by "
                        "evaluate.py --store_temperature, else 1.0")
    args = p.parse_args()

    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from rovit_kan_tpu.evaluation.evaluator import load_model_for_evaluation
    from rovit_kan_tpu.export import save_exported, load_exported
    from rovit_kan_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    # TPU-only exports take the inference build, so the "auto" policy can
    # bake the fused Pallas block kernel into the artifact (tpu_custom_call
    # is on jax.export's guaranteed-stable custom-call list; verified
    # round-trip bit-identical on v5e — docs/VALIDATION.md "Export").
    # Cross-platform exports (--platforms incl. cpu/cuda) must stay on the
    # XLA path: pallas_call cannot lower a Mosaic kernel for other backends.
    import jax
    tpu_only = all(pl == "tpu" for pl in
                   (args.platforms or [jax.default_backend()]))
    model, params = load_model_for_evaluation(args.checkpoint,
                                              inference=tpu_only)
    temperature = args.temperature
    if temperature is None:
        from rovit_kan_tpu.utils.checkpoint import load_meta
        temperature = float(load_meta(args.checkpoint).get("temperature",
                                                           1.0))
    n = save_exported(args.out, model, params, args.batch_size,
                      args.platforms, temperature=temperature)
    t_note = (f", T={temperature:.4f}" if temperature != 1.0 else "")
    print(f"Exported {args.out} ({n / 1e6:.1f} MB, batch={args.batch_size}, "
          f"image_size={model.image_size}{t_note})")

    if args.verify:
        import jax
        from rovit_kan_tpu.serving import build_serving_forward
        rng = np.random.RandomState(0)
        x = rng.randint(0, 256, (args.batch_size, model.image_size,
                                 model.image_size, 3)).astype(np.uint8)
        got = load_exported(args.out)(x)
        want = jax.jit(build_serving_forward(
            model, temperature=temperature))(params, x)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-5, atol=1e-5)
        print(f"Verified: {sorted(want.keys())} match the live model")


if __name__ == "__main__":
    main()
