"""onnxruntime stub: satisfies the reference MetLib.model module-level
calls (reference MetLib/model.py:15, :27) without the ORT wheel. Creating
an actual InferenceSession raises; parity tests run with recheck off."""


def set_default_logger_severity(level):
    return None


def get_available_providers():
    return ["CPUExecutionProvider"]


class InferenceSession:
    def __init__(self, *args, **kwargs):
        raise ImportError("onnxruntime stub: ORT is not installed")
