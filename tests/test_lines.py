"""LSD-style line segment detector (retrieval/vlindex/lib/LSD role)."""

import numpy as np
import pytest

from cvt_tpu.features.lines import detect_line_segments


def _edge_image(h, w, theta_deg, offset=0.0):
    """Step edge through the image center with normal at theta."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    th = np.deg2rad(theta_deg)
    d = ((xx - w / 2) * np.cos(th) + (yy - h / 2) * np.sin(th)) - offset
    img = 1.0 / (1.0 + np.exp(-d * 2.0))         # soft step, ~1px ramp
    return img.astype(np.float32)


def _line_angle_deg(seg):
    x1, y1, x2, y2 = seg
    return np.rad2deg(np.arctan2(y2 - y1, x2 - x1)) % 180.0


@pytest.mark.parametrize("theta", [0.0, 90.0, 35.0])
def test_single_edge_detected(theta):
    img = _edge_image(96, 128, theta)
    out = detect_line_segments(img, max_segments=8)
    valid = np.asarray(out.valid)[0]
    assert valid.any()
    segs = np.asarray(out.segments)[0]
    nfa = np.asarray(out.nfa)[0]
    best = int(np.argmax(np.where(valid, nfa, -np.inf)))
    # the detected line direction is perpendicular to the edge normal
    expect = (theta + 90.0) % 180.0
    got = _line_angle_deg(segs[best])
    diff = min(abs(got - expect), 180.0 - abs(got - expect))
    assert diff < 6.0, (got, expect)
    # the segment midpoint lies on the edge (through the image center)
    mx = (segs[best, 0] + segs[best, 2]) / 2
    my = (segs[best, 1] + segs[best, 3]) / 2
    th = np.deg2rad(theta)
    dist = abs((mx - 64) * np.cos(th) + (my - 48) * np.sin(th))
    assert dist < 4.0, dist
    # the segment spans a substantial part of the edge
    ln = np.hypot(segs[best, 2] - segs[best, 0],
                  segs[best, 3] - segs[best, 1])
    assert ln > 40.0, ln


def test_flat_image_no_segments():
    img = np.full((64, 64), 0.5, np.float32)
    out = detect_line_segments(img, max_segments=8)
    assert not np.asarray(out.valid).any()


def test_noise_rejected_by_nfa():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (96, 96)).astype(np.float32)
    out = detect_line_segments(img, max_segments=16)
    # iid noise must not produce long significant segments
    segs = np.asarray(out.segments)[0][np.asarray(out.valid)[0]]
    if len(segs):
        lengths = np.hypot(segs[:, 2] - segs[:, 0],
                           segs[:, 3] - segs[:, 1])
        assert lengths.max() < 40.0


def test_batched_two_images():
    imgs = np.stack([_edge_image(96, 128, 0.0),
                     _edge_image(96, 128, 90.0)])
    out = detect_line_segments(imgs, max_segments=8)
    valid = np.asarray(out.valid)
    assert valid[0].any() and valid[1].any()
    for bi, theta in enumerate((0.0, 90.0)):
        segs = np.asarray(out.segments)[bi]
        nfa = np.asarray(out.nfa)[bi]
        best = int(np.argmax(np.where(valid[bi], nfa, -np.inf)))
        expect = (theta + 90.0) % 180.0
        got = _line_angle_deg(segs[best])
        diff = min(abs(got - expect), 180.0 - abs(got - expect))
        assert diff < 6.0


def test_ramp_no_phantom_border_segments():
    """A plain intensity ramp has no lines; the wrap-around stencil at
    the image border must not fabricate high-NFA edge segments."""
    xx = np.linspace(0, 1, 128, dtype=np.float32)
    img = np.broadcast_to(xx, (96, 128)).copy()
    out = detect_line_segments(img, max_segments=8)
    assert not np.asarray(out.valid).any()


def test_explicit_params_and_tiny_image():
    img = _edge_image(96, 128, 40.0)
    out = detect_line_segments(img, max_segments=8, tau_deg=30.0,
                               grad_threshold=0.01, min_pixels=20,
                               nfa_eps=1.0)
    assert np.asarray(out.valid).any()
    tiny = _edge_image(8, 8, 0.0)
    out2 = detect_line_segments(tiny, max_segments=128)  # k > h*w
    assert np.asarray(out2.segments).shape == (1, 128, 4)
