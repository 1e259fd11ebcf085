"""Video decode wrappers with a uniform API.

API parity with reference MetLib/videowrapper.py:24-87 (fps / num_frames /
size / read / set_to / release). Backends:
  - OpenCVVideoWrapper: cv2.VideoCapture (FFmpeg).
  - PyAVVideoWrapper: gated on PyAV availability (absent in this image);
    constructing it without PyAV falls back to OpenCV with a warning, so
    reference configs naming it still run.
  - NumpyVideoWrapper: in-memory uint8 array source for tests, benchmarks
    and multi-stream simulations (no decode cost).
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod
from typing import Optional

import cv2
import numpy as np

from ..log import get_default_logger
from ..utils import frame2time, time2frame

logger = get_default_logger()

try:
    import av  # type: ignore
    HAS_PYAV = True
except ImportError:
    av = None
    HAS_PYAV = False


class BaseVideoWrapper(metaclass=ABCMeta):
    """Uniform decode API; see module docstring."""

    def __init__(self, video_name: str, hwaccel: Optional[str] = None) -> None:
        pass

    @property
    @abstractmethod
    def fps(self) -> float:
        ...

    @property
    @abstractmethod
    def num_frames(self) -> int:
        ...

    @property
    @abstractmethod
    def size(self) -> list[int]:
        ...

    @property
    @abstractmethod
    def backend_name(self) -> str:
        ...

    @abstractmethod
    def set_to(self, frame_num: int) -> bool:
        ...

    def force_set_to(self, frame_num: int) -> bool:
        return self.set_to(frame_num)

    @abstractmethod
    def get_video_pos(self) -> int:
        ...

    def release(self) -> None:
        pass

    @abstractmethod
    def read(self) -> tuple[bool, Optional[np.ndarray]]:
        ...

    def read_block(self, num: int) -> tuple[int, Optional[np.ndarray]]:
        """Read up to ``num`` frames as one [T, H, W, C] uint8 array.

        Block reads feed the TPU prefetch path; the base implementation
        loops ``read`` -- backends may override with bulk decode.
        Returns (frames_read, block or None).
        """
        frames = []
        for _ in range(num):
            ok, frame = self.read()
            if not ok or frame is None:
                break
            frames.append(frame)
        if not frames:
            return 0, None
        return len(frames), np.stack(frames)


class OpenCVVideoWrapper(BaseVideoWrapper):
    """cv2.VideoCapture-backed wrapper
    (reference MetLib/videowrapper.py:90-167)."""

    def __init__(self, video_name: str, hwaccel: Optional[str] = None) -> None:
        self.video = cv2.VideoCapture(video_name, cv2.CAP_FFMPEG)
        if not self.video.isOpened():
            raise FileNotFoundError(
                f"The video \"{video_name}\" cannot be opened as a supported "
                "video format.")

    @property
    def fps(self) -> float:
        return self.video.get(cv2.CAP_PROP_FPS)

    @property
    def num_frames(self) -> int:
        return int(self.video.get(cv2.CAP_PROP_FRAME_COUNT))

    @property
    def size(self) -> list[int]:
        return [int(self.video.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(self.video.get(cv2.CAP_PROP_FRAME_HEIGHT))]

    @property
    def backend_name(self) -> str:
        return f"{self.__class__.__name__}({self.video.getBackendName()})"

    def read(self):
        return self.video.read()

    def release(self) -> None:
        self.video.release()

    def set_to(self, frame_num: int) -> bool:
        return self.video.set(cv2.CAP_PROP_POS_MSEC,
                              frame2time(frame_num, self.fps))

    def force_set_to(self, frame_num: int) -> bool:
        self.video.set(cv2.CAP_PROP_POS_FRAMES, 0)
        status = True
        for _ in range(frame_num):
            status = self.video.grab()
            if not status:
                return status
        return status

    def get_video_pos(self) -> int:
        return time2frame(int(self.video.get(cv2.CAP_PROP_POS_MSEC)), self.fps)


class PyAVVideoWrapper(BaseVideoWrapper):
    """PyAV-backed wrapper with PTS-accurate reads
    (reference MetLib/videowrapper.py:170-335).

    PyAV is not installed in this image; instantiation transparently
    delegates to OpenCVVideoWrapper so reference configs keep working.
    """

    def __new__(cls, video_name: str, hwaccel: Optional[str] = None):
        if not HAS_PYAV:
            logger.warning("PyAV not available; PyAVVideoWrapper falls back "
                           "to OpenCVVideoWrapper.")
            return OpenCVVideoWrapper(video_name, hwaccel)
        return super().__new__(cls)

    def __init__(self, video_name: str, hwaccel: Optional[str] = None) -> None:
        assert HAS_PYAV
        opts = {"threads": "auto"}
        self.container = av.open(video_name, options=opts)
        self.stream = self.container.streams.video[0]
        if hwaccel:
            try:
                self.stream.codec_context.options = {"hwaccel": hwaccel}
            except Exception:
                logger.warning(f"hwaccel {hwaccel} not applied.")
        self._iter = self.container.decode(self.stream)
        self._pos = 0

    @property
    def fps(self) -> float:
        return float(self.stream.average_rate)

    @property
    def num_frames(self) -> int:
        if self.stream.frames:
            return int(self.stream.frames)
        dur = float(self.stream.duration * self.stream.time_base)
        return int(round(dur * self.fps))

    @property
    def size(self) -> list[int]:
        return [int(self.stream.width), int(self.stream.height)]

    @property
    def backend_name(self) -> str:
        return f"{self.__class__.__name__}(libav)"

    def read(self):
        try:
            frame = next(self._iter)
        except (StopIteration, Exception):
            return False, None
        self._pos += 1
        return True, frame.to_ndarray(format="bgr24")

    def set_to(self, frame_num: int) -> bool:
        ts = int(frame_num / self.fps / self.stream.time_base)
        self.container.seek(ts, stream=self.stream, any_frame=False)
        self._iter = self.container.decode(self.stream)
        # roll forward to the exact frame
        self._pos = frame_num
        for frame in self._iter:
            if frame.pts is None:
                continue
            cur = int(round(float(frame.pts * self.stream.time_base)
                            * self.fps))
            if cur >= frame_num - 1:
                break
        return True

    def get_video_pos(self) -> int:
        return self._pos

    def release(self) -> None:
        self.container.close()


class NumpyVideoWrapper(BaseVideoWrapper):
    """In-memory frame source: wraps a [T, H, W(, C)] uint8 array.

    Used by tests, bench.py and the multi-stream simulator; plays the role
    of the reference's SeriesLoader mock (MetLib/videowriter.py:46-83) on
    the input side.
    """

    def __init__(self, frames: np.ndarray, fps: float = 25.0,
                 hwaccel: Optional[str] = None) -> None:
        assert frames.dtype == np.uint8 and frames.ndim in (3, 4)
        self.frames = frames
        self._fps = float(fps)
        self._pos = 0

    @property
    def fps(self) -> float:
        return self._fps

    @property
    def num_frames(self) -> int:
        return int(self.frames.shape[0])

    @property
    def size(self) -> list[int]:
        return [int(self.frames.shape[2]), int(self.frames.shape[1])]

    @property
    def backend_name(self) -> str:
        return self.__class__.__name__

    def set_to(self, frame_num: int) -> bool:
        self._pos = max(0, min(frame_num, self.num_frames))
        return True

    def get_video_pos(self) -> int:
        return self._pos

    def read(self):
        if self._pos >= self.num_frames:
            return False, None
        frame = self.frames[self._pos]
        self._pos += 1
        return True, frame

    def read_block(self, num: int):
        end = min(self._pos + num, self.num_frames)
        if end <= self._pos:
            return 0, None
        block = self.frames[self._pos:end]
        got = end - self._pos
        self._pos = end
        return got, block
