"""PyAV import shim: lets the reference's MetLib.videowrapper import
(``import av`` / ``import av.error``) in an image without libav bindings.
Only the OpenCV wrapper is exercised by the parity tests; any attempt to
actually open a container through this stub raises ImportError.
"""

from . import error  # noqa: F401


class VideoFrame:  # annotation target only
    pass


class VideoStream:
    pass


def open(*args, **kwargs):
    raise ImportError("PyAV stub: av is not installed in this image")
