"""Image loaders for the still-image (MetDetPhoto) pipeline.

API parity with reference MetLib/imgloader.py:29-325: ``pop()`` yields
``(filename, image)`` pairs; the multi-threaded variant decodes in parallel
with ordered output and a bounded in-flight budget. Decode stays host-side
(cv2 / rawpy-gated); the heavy inference is batched on device downstream.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from abc import ABCMeta, abstractmethod
from typing import Any, Optional, Union

import numpy as np

from ..log import BaseMetLog, get_default_logger
from .fileio import (SUPPORT_COMMON_FORMAT, SUPPORT_RAW_FORMAT, is_ext_within,
                     load_8bit_image, load_raw_with_preprocess)

ImgPair = tuple[Union[str, None], Union[np.ndarray, None]]

IMG_GET_TIMEOUT = 10
MT_HEART_TIME = 1
DEFAULT_WORKER_NUM = max(1, mp.cpu_count() // 2)


class BaseImgLoader(metaclass=ABCMeta):

    def __init__(self, img_fn_list: list[str]) -> None:
        self.img_fn_list = img_fn_list

    @property
    def num_images(self) -> int:
        return len(self.img_fn_list)

    def start(self):
        pass

    def stop(self):
        pass

    @abstractmethod
    def pop(self) -> ImgPair:
        ...

    def summary(self) -> str:
        return f"{self.__class__.__name__} with {self.num_images} images."


class VanillaImgLoader(BaseImgLoader):
    """Synchronous loader: decodes inside pop()."""

    def __init__(self, img_fn_list: list[str], raw_power: float = 2.222,
                 target_nl_mean: float = 0.3, contrast_alpha: float = 1.2,
                 output_bps: int = 8,
                 logger: Optional[BaseMetLog] = None, **kwargs: Any) -> None:
        super().__init__(img_fn_list)
        self.output_bps = output_bps
        self.raw_power = raw_power
        self.target_nl_mean = target_nl_mean
        self.contrast_alpha = contrast_alpha
        self.logger = logger or get_default_logger()
        self.current_idx = -1

    def _load_at(self, idx: int) -> ImgPair:
        if idx < 0 or idx >= self.num_images:
            return (None, None)
        fname = self.img_fn_list[idx]
        try:
            if is_ext_within(fname, SUPPORT_RAW_FORMAT):
                img = load_raw_with_preprocess(
                    fname, power=self.raw_power,
                    target_nl_mean=self.target_nl_mean,
                    contrast_alpha=self.contrast_alpha,
                    output_bps=8 if self.output_bps == 8 else 16)
            elif is_ext_within(fname, SUPPORT_COMMON_FORMAT):
                img = load_8bit_image(fname)
            else:
                self.logger.error(f"Unsupported image format: {fname}.")
                return (fname, None)
        except (Exception, KeyboardInterrupt) as e:
            self.logger.error(f"Failed to load image {fname}: {e!r}.")
            if isinstance(e, KeyboardInterrupt):
                raise
            return (fname, None)
        return (fname, img)

    def pop(self) -> ImgPair:
        self.current_idx += 1
        return self._load_at(self.current_idx)


class ThreadImgLoader(VanillaImgLoader):
    """Single decode thread + bounded queue."""

    def __init__(self, img_fn_list: list[str], maxsize: int = 1,
                 **kwargs: Any) -> None:
        super().__init__(img_fn_list, **kwargs)
        self.queue: "queue.Queue[ImgPair]" = queue.Queue(maxsize=maxsize)
        self.stopped = False

    def _load_loop(self):
        try:
            while not self.stopped:
                self.current_idx += 1
                pair = self._load_at(self.current_idx)
                self.queue.put(pair, timeout=IMG_GET_TIMEOUT)
                if pair[0] is None:
                    break
        except Exception as e:
            self.logger.error(f"{self.__class__.__name__} terminated: {e!r}")
        finally:
            self.stopped = True

    def start(self):
        while not self.queue.empty():
            self.queue.get()
        self.stopped = False
        self.current_idx = -1
        self.thread = threading.Thread(target=self._load_loop, daemon=True)
        self.thread.start()

    def pop(self) -> ImgPair:
        try:
            if not (self.stopped and self.queue.empty()):
                return self.queue.get(timeout=IMG_GET_TIMEOUT)
        except queue.Empty:
            pass
        return (None, None)

    def stop(self):
        self.stopped = True
        if hasattr(self, "thread"):
            self.thread.join()


class MultiThreadImgLoader(VanillaImgLoader):
    """Worker-pool loader with strictly ordered pop() and a semaphore-bounded
    prefetch budget (reference MetLib/imgloader.py:158-325)."""

    def __init__(self, img_fn_list: list[str],
                 num_workers: int = DEFAULT_WORKER_NUM,
                 max_prefetch: Optional[int] = None, **kwargs: Any) -> None:
        super().__init__(img_fn_list, **kwargs)
        self.num_workers = max(1, int(num_workers))
        self.max_prefetch = max(1, int(max_prefetch
                                       if max_prefetch is not None
                                       else max(2, self.num_workers * 2)))
        self._assign_lock = threading.Lock()
        self._next_assign_idx = 0
        self.results: dict[int, ImgPair] = {}
        self.results_cond = threading.Condition()
        self.next_pop_idx = 0
        self._space_sem = threading.Semaphore(self.max_prefetch)
        self.workers: list[threading.Thread] = []
        self.stopped = False
        self._workers_alive = 0

    def _worker(self, wid: int):
        try:
            while not self.stopped:
                if not self._space_sem.acquire(timeout=MT_HEART_TIME):
                    if self.stopped:
                        break
                    continue
                with self._assign_lock:
                    idx = self._next_assign_idx
                    self._next_assign_idx += 1
                if idx >= self.num_images:
                    self._space_sem.release()
                    break
                pair = self._load_at(idx)
                with self.results_cond:
                    self.results[idx] = pair
                    self.results_cond.notify_all()
        except Exception as e:
            self.logger.error(f"worker#{wid} terminated: {e!r}")
        finally:
            with self.results_cond:
                self._workers_alive -= 1
                self.results_cond.notify_all()

    def start(self):
        with self.results_cond:
            self.results.clear()
            self.next_pop_idx = 0
        with self._assign_lock:
            self._next_assign_idx = 0
        self._space_sem = threading.Semaphore(self.max_prefetch)
        self.stopped = False
        self.workers = []
        self._workers_alive = self.num_workers
        for i in range(self.num_workers):
            t = threading.Thread(target=self._worker, kwargs={"wid": i},
                                 daemon=True)
            t.start()
            self.workers.append(t)

    def pop(self) -> ImgPair:
        with self.results_cond:
            while True:
                if self.next_pop_idx in self.results:
                    fname, img = self.results.pop(self.next_pop_idx)
                    self.next_pop_idx += 1
                    self._space_sem.release()
                    if fname is None and img is None:
                        continue
                    return (fname, img)
                if (self._workers_alive <= 0
                        and self._next_assign_idx >= self.num_images
                        and not self.results):
                    return (None, None)
                self.results_cond.wait(timeout=MT_HEART_TIME)

    def stop(self):
        self.stopped = True
        for _ in range(self.num_workers):
            self._space_sem.release()
        for t in self.workers:
            if t.is_alive():
                t.join()
