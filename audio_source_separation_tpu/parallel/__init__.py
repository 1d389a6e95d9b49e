from .mesh import make_mesh, shard_spectrogram
from .batch import batch_separate
from .sharded import make_mesh_2d, make_sharded_train_step, auxiva_ip_step

__all__ = [
    "make_mesh",
    "shard_spectrogram",
    "batch_separate",
    "make_mesh_2d",
    "make_sharded_train_step",
    "auxiva_ip_step",
]
