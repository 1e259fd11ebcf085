"""Image-loader unit tests (reference MetLib/imgloader.py parity surface).

Covers what the MetDetPhoto CLI smoke tests don't: strict output ordering
under skewed decode latencies, the bounded in-flight window, and failure
pairs passing through as ``(fname, None)``.
"""

import threading
import time

import numpy as np
import pytest

from metdetpy_tpu.io import imgloader as il
from metdetpy_tpu.io.imgloader import (MultiThreadImgLoader, ThreadImgLoader,
                                       VanillaImgLoader)


@pytest.fixture()
def img_files(tmp_path):
    import cv2
    names = []
    for i in range(12):
        p = tmp_path / f"img_{i:02d}.png"
        img = np.full((8, 8, 3), i, dtype=np.uint8)
        cv2.imwrite(str(p), img)
        names.append(str(p))
    return names


def _drain(loader):
    loader.start()
    out = []
    while True:
        fname, img = loader.pop()
        if fname is None and img is None:
            break
        out.append((fname, img))
    loader.stop()
    return out


@pytest.mark.parametrize("cls", [VanillaImgLoader, ThreadImgLoader,
                                 MultiThreadImgLoader])
def test_ordered_and_complete(cls, img_files):
    out = _drain(cls(img_files))
    assert [f for f, _ in out] == img_files
    for i, (_, img) in enumerate(out):
        assert img is not None and int(img[0, 0, 0]) == i


def test_mt_order_under_skewed_latency(img_files, monkeypatch):
    """Workers finishing out of order must not reorder pop() output."""
    orig = MultiThreadImgLoader._load_at

    def slow_evens(self, idx):
        if idx % 2 == 0:
            time.sleep(0.05)
        return orig(self, idx)

    monkeypatch.setattr(MultiThreadImgLoader, "_load_at", slow_evens)
    out = _drain(MultiThreadImgLoader(img_files, num_workers=4))
    assert [f for f, _ in out] == img_files


def test_mt_inflight_window_bounds_prefetch(img_files, monkeypatch):
    """No more than `window` decodes may ever be in flight at once."""
    peak = [0]
    active = [0]
    lock = threading.Lock()
    orig = MultiThreadImgLoader._load_at

    def counting(self, idx):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        time.sleep(0.01)
        try:
            return orig(self, idx)
        finally:
            with lock:
                active[0] -= 1
    monkeypatch.setattr(MultiThreadImgLoader, "_load_at", counting)

    loader = MultiThreadImgLoader(img_files, num_workers=8, max_prefetch=3)
    assert loader.window == 3
    _drain(loader)
    assert peak[0] <= 3


def test_failure_pair_passes_through(img_files, tmp_path):
    bad = str(tmp_path / "missing.png")
    files = img_files[:2] + [bad] + img_files[2:4]
    out = []
    loader = MultiThreadImgLoader(files, num_workers=2)
    loader.start()
    for _ in range(len(files)):
        out.append(loader.pop())
    assert loader.pop() == (None, None)      # exhausted
    loader.stop()
    assert loader.pop() == (None, None)      # stop() does not replay
    assert [f for f, _ in out] == files
    assert out[2][1] is None                 # failed decode -> (fname, None)
    assert all(img is not None for i, (f, img) in enumerate(out) if i != 2)


def test_unsupported_extension_logged_not_fatal(tmp_path):
    weird = tmp_path / "notes.txt"
    weird.write_text("hi")
    loader = VanillaImgLoader([str(weird)])
    fname, img = loader.pop()
    assert fname == str(weird) and img is None


def test_restart_replays_from_beginning(img_files):
    loader = MultiThreadImgLoader(img_files[:4], num_workers=2)
    first = [f for f, _ in _drain(loader)]
    second = [f for f, _ in _drain(loader)]  # start() twice, same output
    assert first == second == img_files[:4]


def test_no_reference_internal_names():
    """Guard: the rebuild's pool is the future-window design, not the
    reference's shared-index/semaphore worker pool."""
    src = open(il.__file__).read()
    for legacy in ("_next_assign_idx", "_space_sem", "results_cond",
                   "MT_HEART_TIME"):
        assert legacy not in src
