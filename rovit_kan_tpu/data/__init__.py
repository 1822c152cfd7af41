from rovit_kan_tpu.data.dataset import (  # noqa: F401
    RoseLeafDataset,
    Loader,
    create_dataloaders,
)
from rovit_kan_tpu.data.synthetic import generate_synthetic_dataset  # noqa: F401
