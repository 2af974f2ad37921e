from .config import SweepConfig, load_sweep, expand_grid, build_clip_config
