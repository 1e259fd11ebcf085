"""Device-side (JAX/XLA/Pallas) compute kernels for MetDetPy-TPU.

These modules replace the OpenCV/numpy per-frame host kernels of the
reference (see SURVEY.md §2.9) with batched, TPU-friendly implementations
operating on ``[T, H, W]`` frame blocks.
"""

from . import filters, hough, nms, transforms, windows  # noqa: F401
