from .seed import set_seed
from .io import get_valid_dir, filter_files, find_indices_in_arrays, is_subset
from .logging import MetricsLogger
