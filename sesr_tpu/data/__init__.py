from sesr_tpu.data.bayer import (
    mosaic, four2three, expand_bayer_plane, random_noise_levels, add_noise,
)
from sesr_tpu.data.datasets import (
    SRFolderDataset, RawBayerDataset, SyntheticDataset, RealImageDataset,
    builtin_real_images, task_pair_from_image, load_reference_fixture,
)
