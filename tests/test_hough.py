"""Detection-level parity tests for the device Hough kernel vs
cv2.HoughLinesP. Exact parity is impossible (OpenCV's variant is random &
sequential); we assert that every clearly-drawn segment is recovered with
endpoint tolerance, and that empty/noise frames behave sanely."""

import cv2
import numpy as np

from metdetpy_tpu.ops.hough import hough_lines_batch, hough_lines_single


def _draw_lines(shape, segments):
    img = np.zeros(shape, dtype=np.uint8)
    for (x1, y1, x2, y2) in segments:
        cv2.line(img, (x1, y1), (x2, y2), 255, 1)
    return img


def _endpoints_match(line, seg, tol):
    x1, y1, x2, y2 = [float(v) for v in line]
    a = np.array([[x1, y1], [x2, y2]])
    b = np.array([seg[:2], seg[2:]], dtype=float)
    d1 = max(np.linalg.norm(a[0] - b[0]), np.linalg.norm(a[1] - b[1]))
    d2 = max(np.linalg.norm(a[0] - b[1]), np.linalg.norm(a[1] - b[0]))
    return min(d1, d2) <= tol


def _covered(lines, seg, tol=4.0, min_cover=0.75):
    """True if the union of detected lines lying on `seg` covers most of its
    extent. This is the collector-level parity criterion: cv2.HoughLinesP
    also splits long off-grid lines into collinear fragments, and the
    reference collector accumulates fragments into one series range
    (MetLib/collector.py:317-329)."""
    p1 = np.array(seg[:2], float)
    p2 = np.array(seg[2:], float)
    d = p2 - p1
    length = np.linalg.norm(d)
    u = d / length
    span = []
    for (x1, y1, x2, y2) in lines:
        for pt in (np.array([x1, y1], float), np.array([x2, y2], float)):
            t = np.dot(pt - p1, u)
            perp = np.linalg.norm(pt - (p1 + t * u))
            if perp <= tol and -tol <= t <= length + tol:
                span.append(t)
    if len(span) < 2:
        return False
    return (max(span) - min(span)) >= min_cover * length


def test_single_segment_recovered():
    seg = (20, 30, 90, 100)
    img = _draw_lines((128, 128), [seg])
    res = hough_lines_single(img, 10.0, threshold=10, min_len=10)
    lines = np.asarray(res.lines[0])[np.asarray(res.valid[0])]
    assert len(lines) >= 1
    assert any(_endpoints_match(l, seg, tol=6) for l in lines)


def test_multiple_segments_recovered():
    segments = [(10, 10, 110, 15), (5, 120, 120, 8), (64, 5, 64, 120)]
    img = _draw_lines((128, 128), segments)
    res = hough_lines_single(img, 10.0, threshold=10, min_len=10)
    lines = np.asarray(res.lines[0])[np.asarray(res.valid[0])]
    for seg in segments:
        assert _covered(lines, seg), seg


def test_empty_frame_no_lines():
    img = np.zeros((96, 128), dtype=np.uint8)
    res = hough_lines_single(img, 10.0, threshold=10, min_len=10)
    assert not np.asarray(res.valid).any()
    assert int(res.npix[0]) == 0


def test_short_segment_rejected_by_min_len():
    img = _draw_lines((96, 128), [(40, 40, 45, 44)])  # L-inf len 5
    res = hough_lines_single(img, 10.0, threshold=3, min_len=10)
    assert not np.asarray(res.valid).any()


def test_gap_bridging():
    # two collinear pieces separated by a 6-px gap: bridged at gap=10,
    # split (shorter pieces) at gap=2
    img = np.zeros((96, 128), dtype=np.uint8)
    cv2.line(img, (10, 50), (50, 50), 255, 1)
    cv2.line(img, (57, 50), (100, 50), 255, 1)
    res_wide = hough_lines_single(img, 10.0, threshold=10, min_len=10)
    lines = np.asarray(res_wide.lines[0])[np.asarray(res_wide.valid[0])]
    assert any(_endpoints_match(l, (10, 50, 100, 50), tol=4) for l in lines)

    res_narrow = hough_lines_single(img, 2.0, threshold=10, min_len=10)
    lines_n = np.asarray(res_narrow.lines[0])[np.asarray(res_narrow.valid[0])]
    # no single bridged line spanning the whole extent
    assert not any(_endpoints_match(l, (10, 50, 100, 50), tol=4)
                   for l in lines_n)


def test_batch_consistency(rng):
    imgs = np.stack([
        _draw_lines((96, 128), [(10, 10, 90, 80)]),
        np.zeros((96, 128), dtype=np.uint8),
        _draw_lines((96, 128), [(5, 90, 120, 20)]),
    ])
    gaps = np.full((3,), 10.0, dtype=np.float32)
    res = hough_lines_batch(imgs, gaps, threshold=10, min_len=10)
    assert np.asarray(res.valid[0]).any()
    assert not np.asarray(res.valid[1]).any()
    assert np.asarray(res.valid[2]).any()


def test_agreement_with_cv2_on_clean_scene():
    """On a clean synthetic scene, our detector should find segments where
    cv2.HoughLinesP finds them (IoU of detections at coarse tolerance)."""
    segments = [(15, 20, 100, 90), (110, 10, 20, 110)]
    img = _draw_lines((128, 128), segments)
    ref = cv2.HoughLinesP(img, rho=1, theta=np.pi / 180, threshold=10,
                          minLineLength=10, maxLineGap=10)
    assert ref is not None and len(ref) >= 2
    res = hough_lines_single(img, 10.0, threshold=10, min_len=10)
    lines = np.asarray(res.lines[0])[np.asarray(res.valid[0])]
    for seg in segments:
        assert _covered(lines, seg, tol=6), seg


def test_overflow_flag():
    img = np.full((64, 64), 255, dtype=np.uint8)  # 4096 active pixels
    res = hough_lines_single(img, 10.0, threshold=10, min_len=10,
                             max_points=1024)
    assert bool(res.overflow[0])
    assert not np.asarray(res.valid).any()


def test_extract_cols_matches_gather_walk(rng):
    """The gather-free axis-aligned extraction (production path) is
    output-equivalent to the explicit step-indexed gather walk across
    random shapes, densities, angles and gap settings."""
    import jax.numpy as jnp
    from metdetpy_tpu.ops import hough

    for trial in range(12):
        h, w = [(96, 160), (144, 256), (60, 60)][trial % 3]
        n_steps = hough._round_up(max(h, w) + 4, 128)
        s_dim = hough._round_up(max(h, w) + 1, 128)
        rho_offset = w + h
        n_rho = 2 * (w + h) + 1
        k = 16
        dens = [0.002, 0.02, 0.1][(trial // 3) % 3]
        img = (rng.random((h, w)) < dens).astype(np.uint8)
        pk = hough.pack_corners(jnp.asarray(img))
        pkt = hough.pack_corners(jnp.asarray(img.T))
        planes = jnp.zeros((2, s_dim, s_dim), jnp.uint8)
        planes = planes.at[0, :h + 1, :w + 1].set(pk)
        planes = planes.at[1, :w + 1, :h + 1].set(pkt)
        theta = jnp.asarray(rng.integers(0, 180, k).astype(np.int32))
        rho = jnp.asarray(rng.integers(0, n_rho, k).astype(np.int32))
        ok_in = jnp.asarray(rng.random(k) < 0.9)
        gap = np.float32([0.0, 4.0, 10.0][trial % 3])
        min_len = [3, 10][trial % 2]
        l1, o1 = hough._extract_segments(pk, theta, rho, ok_in, rho_offset,
                                         min_len, gap, n_steps)
        l2, o2 = hough._extract_segments_cols(planes, theta, rho, ok_in,
                                              rho_offset, min_len, gap,
                                              n_steps, h, w)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        np.testing.assert_array_equal(np.asarray(l1)[np.asarray(o1)],
                                      np.asarray(l2)[np.asarray(o2)])


def test_compact_indices_matches_nonzero():
    """The binary-search compaction is exactly 'first k nonzero indices'
    across densities, including the over-capacity and empty cases."""
    import jax.numpy as jnp
    from metdetpy_tpu.ops.hough import _compact_indices

    rng = np.random.default_rng(11)
    for n, k, p in ((5000, 64, 0.002), (518400, 256, 0.0005),
                    (1500, 32, 0.5), (700, 16, 0.0), (513, 8, 1.0)):
        flat = (rng.random(n) < p).astype(np.uint8)
        idx, valid = _compact_indices(jnp.asarray(flat), k)
        idx, valid = np.asarray(idx), np.asarray(valid)
        ref = np.nonzero(flat)[0][:k]
        assert valid.sum() == len(ref)
        np.testing.assert_array_equal(idx[: len(ref)], ref)
        assert (idx[len(ref):] == -1).all()
