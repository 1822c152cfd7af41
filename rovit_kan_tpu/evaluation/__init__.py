from rovit_kan_tpu.evaluation.metrics import (  # noqa: F401
    accuracy,
    macro_f1,
    weighted_f1,
    mae,
    spearman_rho,
    brier_score,
    ece,
    count_params,
    compute_confusion_matrix,
    per_class_metrics,
    fps_benchmark,
)
from rovit_kan_tpu.evaluation.evaluator import (  # noqa: F401
    Evaluator,
    load_model_for_evaluation,
)
