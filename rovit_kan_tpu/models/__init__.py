from rovit_kan_tpu.models.vit import VisionTransformer, DeiTTinyBackbone  # noqa: F401
from rovit_kan_tpu.models.heads import (  # noqa: F401
    ClassificationHead,
    OrdinalHead,
    UncertaintyHead,
)
from rovit_kan_tpu.models.kan import KANLayer, KANSeverityModule  # noqa: F401
from rovit_kan_tpu.models.rovit_kan import RoViTKAN, build_model  # noqa: F401
