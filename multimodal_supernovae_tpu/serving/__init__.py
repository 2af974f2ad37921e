from .batcher import DynamicBatcher
from .server import EmbedServer, ServingModel, load_artifact, load_live, serve

__all__ = [
    "DynamicBatcher",
    "EmbedServer",
    "ServingModel",
    "load_artifact",
    "load_live",
    "serve",
]
