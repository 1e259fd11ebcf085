"""MetDetPy-TPU: TPU-native meteor detection framework (JAX/XLA/Pallas).

Component registry with name->class resolution for config strings
(parity with reference MetLib/__init__.py:17-48, including the reference
class names as aliases so reference config files load unchanged).
"""

from __future__ import annotations

import os
from typing import Callable

from .version import PROJECT_NAME, VERSION  # noqa: F401

# persistent XLA compilation cache: detection kernels are compiled per
# block-shape bucket; caching makes every run after the first start hot
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcache"))


def _loaders():
    from .io.videoloader import (BlockVideoLoader, ProcessVideoLoader,
                                 ThreadVideoLoader, VanillaVideoLoader)
    return {
        "VanillaVideoLoader": VanillaVideoLoader,
        "ThreadVideoLoader": ThreadVideoLoader,
        "BlockVideoLoader": BlockVideoLoader,
        "ProcessVideoLoader": ProcessVideoLoader,
    }


def _wrappers():
    from .io.mjpgavi import MJPGAVIVideoWrapper
    from .io.videowrapper import (NumpyVideoWrapper, OpenCVVideoWrapper,
                                  PyAVVideoWrapper)
    return {
        "OpenCVVideoWrapper": OpenCVVideoWrapper,
        "PyAVVideoWrapper": PyAVVideoWrapper,
        "NumpyVideoWrapper": NumpyVideoWrapper,
        "MJPGAVIVideoWrapper": MJPGAVIVideoWrapper,
    }


def _detectors():
    from .detectors.m3det import (ClassicDetector, DiffAreaGuidingDetecor,
                                  M3Detector)
    out = {
        "M3Detector": M3Detector,
        "ClassicDetector": ClassicDetector,
        "DiffAreaGuidingDetecor": DiffAreaGuidingDetecor,
    }
    try:
        from .detectors.mldet import MLDetector
        out["MLDetector"] = MLDetector
    except ImportError:
        pass
    return out


def _writers():
    from .io.videowriter import (BaseVideoWriter, FFMpegVideoWriter,
                                 OpenCVVideoWriter, PyAVVideoWriter)
    return {
        "BaseVideoWriter": BaseVideoWriter,
        "OpenCVVideoWriter": OpenCVVideoWriter,
        "PyAVVideoWriter": PyAVVideoWriter,
        "FFMpegVideoWriter": FFMpegVideoWriter,
    }


def _models():
    from .models import YOLOModel
    return {"YOLOModel": YOLOModel}


def _resolver(kind: str, table_fn: Callable[[], dict]):
    def get(class_name: str):
        table = table_fn()
        if class_name not in table:
            raise Exception(f"No class named {class_name} for {kind}.")
        return table[class_name]
    return get


get_loader = _resolver("loader", _loaders)
get_wrapper = _resolver("wrapper", _wrappers)
get_detector = _resolver("detector", _detectors)
get_writer = _resolver("writer", _writers)
get_model = _resolver("model", _models)
