from .batching import Batch, MODALITIES
from .extinction import ccm89
from .transforms import (
    pad_or_subsample,
    zero_time_origin_per_band,
    band_block_concat,
)
