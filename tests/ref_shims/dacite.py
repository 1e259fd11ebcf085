"""dacite shim for running the UNMODIFIED reference (/root/reference) in
this image, where the real dacite wheel is absent.

Re-exports metdetpy_tpu.structs' dacite-free ``from_dict`` engine, which
implements the same contract the reference's metstruct.py relies on
(reference MetLib/metstruct.py:11, :117-124): recursive dataclass
construction, Optional/Union member trials in declaration order, ignoring
extra keys, and int->float coercion.
"""

from typing import Any

from metdetpy_tpu.structs import StructError, _build


class DaciteError(Exception):
    pass


class MissingValueError(DaciteError):
    pass


def from_dict(data_class: type, data: dict, config: Any = None):
    try:
        return _build(data_class, data)
    except StructError as e:
        raise DaciteError(str(e)) from e


class Config:  # accepted and ignored (the reference never passes one)
    def __init__(self, *args, **kwargs):
        pass
