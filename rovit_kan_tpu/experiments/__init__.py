from rovit_kan_tpu.experiments.ablation import (  # noqa: F401
    AblationConfig,
    AblationExperiment,
    run_ablation_study,
    CANONICAL_VARIANTS,
)
from rovit_kan_tpu.experiments.baselines import (  # noqa: F401
    BaselineExperiment,
    run_baseline_experiments,
)
