"""Contour extraction (utils.contour) — the reference's utils2
ContourSeries capability (examples/utils2/src/contour_series.rs:5-147):
marching squares with |z|-weighted edge interpolation."""

import numpy as np

from totsu_tpu.utils import contour_segments, contour_series, chain_segments


def test_affine_level_set_is_exact():
    # bilinear edge interpolation is exact for affine f along grid edges
    xs = np.linspace(-1, 1, 9)
    ys = np.linspace(-1, 1, 7)
    gx, gy = np.meshgrid(xs, ys)
    z = 2.0 * gx - gy + 0.25
    segs = contour_segments(xs, ys, z)
    assert segs.shape[0] > 0
    pts = segs.reshape(-1, 2)
    resid = 2.0 * pts[:, 0] - pts[:, 1] + 0.25
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)


def test_circle_segments_lie_near_level_set_and_chain_closed():
    xs = np.linspace(-1.5, 1.5, 61)
    ys = np.linspace(-1.5, 1.5, 61)
    segs = contour_series(xs, ys, lambda x, y: x * x + y * y, level=1.0)
    assert segs.shape[0] > 40
    pts = segs.reshape(-1, 2)
    r = np.hypot(pts[:, 0], pts[:, 1])
    # within a cell size of the unit circle (curvature error of the
    # per-edge linear interpolation)
    h = xs[1] - xs[0]
    assert np.max(np.abs(r - 1.0)) < h
    # chains into one closed loop covering the full angle range
    lines = chain_segments(segs, tol=1e-9)
    assert len(lines) == 1
    loop = lines[0]
    np.testing.assert_allclose(loop[0], loop[-1], atol=1e-9)
    ang = np.unwrap(np.arctan2(loop[:, 1], loop[:, 0]))
    assert abs(abs(ang[-1] - ang[0]) - 2 * np.pi) < 1e-6


def test_saddle_cells_emit_two_nonintersecting_segments():
    xs = np.array([0.0, 1.0])
    ys = np.array([0.0, 1.0])
    for z, n_expected in [
            (np.array([[1.0, -1.0], [-1.0, 1.0]]), 2),   # code 9
            (np.array([[-1.0, 1.0], [1.0, -1.0]]), 2),   # code 6
    ]:
        segs = contour_segments(xs, ys, z)
        assert segs.shape[0] == n_expected
        # the two segments must not share any endpoint
        a, b = segs
        for p in a:
            for q in b:
                assert np.linalg.norm(p - q) > 0.1


def test_levels_and_empty_and_shape_validation():
    xs = np.linspace(0, 1, 5)
    ys = np.linspace(0, 1, 5)
    gx, gy = np.meshgrid(xs, ys)
    z = gx + gy
    # level entirely outside the sampled range -> no segments
    assert contour_segments(xs, ys, z, level=5.0).shape == (0, 2, 2)
    assert chain_segments(contour_segments(xs, ys, z, level=5.0)) == []
    # non-default level sits on the right line
    segs = contour_segments(xs, ys, z, level=1.0)
    pts = segs.reshape(-1, 2)
    np.testing.assert_allclose(pts[:, 0] + pts[:, 1], 1.0, atol=1e-12)
    # mismatched shapes raise
    try:
        contour_segments(xs, ys[:-1], z)
    except ValueError:
        pass
    else:
        raise AssertionError("shape mismatch not caught")
