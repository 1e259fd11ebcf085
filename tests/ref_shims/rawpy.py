"""rawpy stub: satisfies MetLib.fileio's top-level import; RAW decode is
not exercised by the parity tests."""


class LibRawError(Exception):
    pass


def imread(*args, **kwargs):
    raise ImportError("rawpy stub: LibRaw is not installed")
