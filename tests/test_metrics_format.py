"""Format-fixture compatibility: our evaluator's test_metrics.json must
carry (at least) every key the reference's recorded ablation outputs carry
(SURVEY.md §4: the reference's outputs/ablation/*/test_metrics.json are its
only 'golden' data; they serve as format fixtures here)."""
import json
from pathlib import Path

import pytest

REFERENCE_FIXTURE = Path("/root/reference/outputs/ablation/full_model/"
                         "test_metrics.json")

# Keys the reference writes at top level (verbatim from the fixture).
REFERENCE_KEYS = {"accuracy", "macro_f1", "weighted_f1", "mae",
                  "spearman_rho", "spearman", "brier_score", "ece", "fps",
                  "params", "params_m", "per_class"}
REFERENCE_PER_CLASS_KEYS = {"precision", "recall", "f1", "support"}


@pytest.fixture(scope="module")
def our_metrics(tmp_path_factory):
    import jax
    import numpy as np
    from rovit_kan_tpu.config import get_config
    from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset
    from rovit_kan_tpu.data.dataset import RoseLeafDataset, Loader
    from rovit_kan_tpu.models.rovit_kan import RoViTKAN
    from rovit_kan_tpu.evaluation.evaluator import Evaluator

    tmp = tmp_path_factory.mktemp("fmt")
    cfg = get_config()
    cfg.data.image_size = 32
    root = generate_synthetic_dataset(tmp / "d", n_per_class=2, size=32)
    ds = RoseLeafDataset(root, cfg.data.class_names, cfg.data.severity_map,
                         image_size=32)
    model = RoViTKAN(embed_dim=32, depth=1, num_heads=2, image_size=32,
                     patch_size=16, kan_layers=(32, 8, 1), hidden_dim=16,
                     use_pallas_attention=False, use_pallas_kan=False)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 32, 32, 3), np.float32))["params"]
    ev = Evaluator(model, params, Loader(ds, 4), cfg, output_dir=tmp / "o")
    ev.evaluate(run_fps=True)
    return json.loads((tmp / "o" / "test_metrics.json").read_text())


def test_reference_fixture_exists():
    assert REFERENCE_FIXTURE.exists()
    ref = json.loads(REFERENCE_FIXTURE.read_text())
    assert REFERENCE_KEYS <= set(ref.keys())


def test_our_json_covers_reference_keys(our_metrics):
    missing = REFERENCE_KEYS - set(our_metrics.keys())
    assert not missing, f"missing keys vs reference fixture: {missing}"
    for cls, m in our_metrics["per_class"].items():
        assert REFERENCE_PER_CLASS_KEYS <= set(m.keys()), cls


def test_reference_param_count_is_our_parity_target():
    ref = json.loads(REFERENCE_FIXTURE.read_text())
    assert int(ref["params"]) == 5706394   # matched by test_model.py
