from rovit_kan_tpu.explainability.attention_maps import (  # noqa: F401
    ViTAttentionRollout,
    attention_rollout,
)
from rovit_kan_tpu.explainability.gradcam import (  # noqa: F401
    GradCAMPlusPlus,
    gradcam_plus_plus,
)
from rovit_kan_tpu.explainability.kan_viz import KANVisualizer  # noqa: F401
