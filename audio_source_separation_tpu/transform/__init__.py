from .stft import stft, istft, build_window, build_optimal_window
from .pca import pca
from .whitening import whitening

__all__ = ["stft", "istft", "build_window", "build_optimal_window", "pca", "whitening"]
