from .embeddings import get_embeddings
from .export import export_encoder, load_exported
from .probes import linear_probe, knn_probe
from .metrics import calculate_metrics, merge_kfold_results
