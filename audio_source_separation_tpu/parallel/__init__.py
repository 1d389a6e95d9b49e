from .mesh import make_mesh, shard_spectrogram

__all__ = ["make_mesh", "shard_spectrogram"]
