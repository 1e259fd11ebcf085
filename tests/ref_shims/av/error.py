"""av.error stub (see av/__init__.py)."""


class FFmpegError(Exception):
    pass


class ValueError(FFmpegError):
    pass


class EOFError(FFmpegError):
    pass
