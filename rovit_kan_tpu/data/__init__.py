from rovit_kan_tpu.data.dataset import (  # noqa: F401
    RoseLeafDataset,
    Subset,
    Loader,
    create_dataloaders,
)
from rovit_kan_tpu.data.device_cache import (  # noqa: F401
    DeviceLoader,
    device_cache_loaders,
)
from rovit_kan_tpu.data.transforms import (  # noqa: F401
    augmented_transforms,
    original_transforms,
    inference_transforms,
    cutmix_or_mixup,
)
from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset  # noqa: F401
