"""Tests: video decode + video object match, pupil tracking, text
embeddings (SURVEY.md §2 #8/#9, #28, #25)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------------
# video (io/video.py + apps/video_match.py)
# ---------------------------------------------------------------------

def _have_cv2():
    try:
        import cv2  # noqa: F401
        return True
    except Exception:
        return False


def _bandlimited(rng, shape, sigma):
    """Smoothed noise: white noise has no interior-scale DoG extrema (all
    energy at the finest level, which SIFT discards by design — VLFeat
    does too), so synthetic textures must be band-limited to be a fair
    input for any scale-space detector."""
    from scipy.ndimage import gaussian_filter
    x = gaussian_filter(rng.random(shape).astype(np.float32), sigma)
    x -= x.min()
    return x / max(float(x.max()), 1e-6)


def _textured_frames(rng, t=6, h=64, w=80):
    """Frames with a recognizable band-limited texture patch in some."""
    frames = np.stack([_bandlimited(rng, (h, w), 3.0) * 0.3
                       for _ in range(t)])
    patch = _bandlimited(rng, (32, 32), 1.5)
    hit_ids = [2, 4]
    for i in hit_ids:
        frames[i, 16:48, 24:56] = patch
    return frames, patch, hit_ids


@pytest.mark.skipif(not _have_cv2(), reason="cv2 unavailable")
def test_video_reader_roundtrip(tmp_path, rng):
    from cvt_tpu.io.video import VideoReader, write_video
    frames = rng.random((8, 48, 64)).astype(np.float32)
    p = str(tmp_path / "clip.mp4")
    write_video(p, frames, fps=10.0)

    r = VideoReader(p, gray=True)
    decoded = list(r)
    assert len(decoded) == 8
    assert decoded[0].shape == (48, 64)
    assert 0.0 <= decoded[0].min() and decoded[0].max() <= 1.0
    r.release()

    # in-memory buffer open (the FFDecoder read_buffer capability)
    buf = open(p, "rb").read()
    r2 = VideoReader(buf, gray=True, frame_stride=2)
    decoded2 = list(r2)
    assert len(decoded2) == 4
    r2.release()

    # batching pads the tail and reports true length
    r3 = VideoReader(p, gray=True)
    batches = list(r3.batches(3))
    assert [n for _, n in batches] == [3, 3, 2]
    assert all(b.shape == (3, 48, 64) for b, _ in batches)


def test_video_match_frames(rng):
    from cvt_tpu.apps.video_match import VideoObjectMatcher
    frames, patch, hit_ids = _textured_frames(rng)
    m = VideoObjectMatcher(patch, min_inliers=8, max_features=128)
    res = m.match_frames(frames, key=jax.random.PRNGKey(0))
    assert res.n_frames == len(frames)
    for i in hit_ids:
        assert i in res.frame_ids.tolist()
    # frames 0/1 are pure noise at a different resolution of detail —
    # they must not dominate; allow at most one false positive
    fp = set(res.frame_ids.tolist()) - set(hit_ids)
    assert len(fp) <= 1


# ---------------------------------------------------------------------
# pupil tracking (apps/pupil.py)
# ---------------------------------------------------------------------

def test_pupil_synthetic():
    from cvt_tpu.apps.pupil import find_pupil, render_eye
    eyes = np.stack([
        render_eye(cx=64, cy=48, a=14, b=10, angle=0.3),
        render_eye(cx=50, cy=40, a=10, b=8, angle=-0.5),
    ])
    res = find_pupil(jax.random.PRNGKey(1), jnp.asarray(eyes))
    assert bool(res.ok[0]) and bool(res.ok[1])
    np.testing.assert_allclose(np.asarray(res.center[0]), [64, 48], atol=4.0)
    np.testing.assert_allclose(np.asarray(res.center[1]), [50, 40], atol=4.0)
    # semi-axes in the right ballpark (sorted descending)
    a0 = np.sort(np.asarray(res.axes[0]))[::-1]
    assert 9.0 < a0[0] < 20.0 and 6.0 < a0[1] < 15.0


def test_pupil_specular_removal():
    from cvt_tpu.apps.pupil import remove_specular, render_eye
    eye = render_eye(specular=True)[None]
    out = np.asarray(remove_specular(jnp.asarray(eye)))
    assert out.max() < 0.95          # highlight gone
    assert abs(out.mean() - eye.mean()) < 0.05


def test_coarse_center():
    from cvt_tpu.apps.pupil import coarse_pupil_center, render_eye
    eye = render_eye(cx=70, cy=50, a=12, b=12, specular=False)[None]
    c, r = coarse_pupil_center(jnp.asarray(eye))
    np.testing.assert_allclose(np.asarray(c[0]), [70, 50], atol=8.0)


# ---------------------------------------------------------------------
# text embeddings (features/text.py)
# ---------------------------------------------------------------------

def test_text_embedder_vocab_and_oov():
    from cvt_tpu.features.text import TextEmbedder
    emb = TextEmbedder.random(["cat", "dog", "fish"], dim=32)
    v = np.asarray(emb.embed_words(["cat", "dog", "cat"]))
    assert v.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(v[0], v[2], atol=1e-6)   # deterministic
    assert not np.allclose(v[0], v[1])
    # OOV via hashed n-grams: stable and normalized
    o1 = np.asarray(emb.embed_words(["catt"]))
    o2 = np.asarray(emb.embed_words(["catt"]))
    np.testing.assert_allclose(o1, o2)
    np.testing.assert_allclose(np.linalg.norm(o1, axis=1), 1.0, atol=1e-5)


def test_text_embed_ids_device_path():
    from cvt_tpu.features.text import embed_ids
    table = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 8)).astype(np.float32))
    ids = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.float32)
    out = embed_ids(table, ids, mask)
    assert out.shape == (2, 8)
    want = np.asarray(table)[[1, 2, 3]].mean(0)
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-5)


def test_sentence_embedding_similarity():
    from cvt_tpu.features.text import TextEmbedder
    emb = TextEmbedder.random(["red", "blue", "car", "truck", "sky"],
                              dim=48, seed=1)
    s = emb.embed_sentences(["red car", "red car", "blue sky"])
    sim = np.asarray(s @ s.T)
    assert sim[0, 1] > 0.999
    assert sim[0, 2] < sim[0, 1]


def test_native_memory_decode(tmp_path, rng):
    """The native AVIO memory decoder (native/ffdecode.cc — the true
    FFDecoder read_buffer equivalent, ffdecoder.h:18-59) decodes bytes
    WITHOUT touching the filesystem and agrees with the file path."""
    from cvt_tpu.io.video import VideoReader, _native_lib, write_video
    if _native_lib() is None:
        import pytest
        pytest.skip("libav* not available on this machine")
    frames = rng.random((6, 48, 64)).astype(np.float32)
    p = str(tmp_path / "clip.mp4")
    write_video(p, frames, fps=10.0)
    buf = open(p, "rb").read()
    r = VideoReader(buf, gray=True)
    assert r._native is not None and r._tmp is None  # no temp file
    mem_frames = list(r)
    r.release()
    r2 = VideoReader(p, gray=True)
    file_frames = list(r2)
    r2.release()
    assert len(mem_frames) == len(file_frames) == 6
    for a, b in zip(mem_frames, file_frames):
        np.testing.assert_allclose(a, b, atol=1e-6)


# ---------------------------------------------------------------------------
# image undistorter (exe/image.cc:77-407)
# ---------------------------------------------------------------------------

def test_image_undistorter_roundtrip():
    """Render a smooth scene through a radially-distorted camera, then
    undistort: the result must match the pinhole render of the same
    scene (PSNR bound on the interior) — the distort->undistort check
    from base/undistortion.cc's semantics."""
    import jax.numpy as jnp
    from cvt_tpu.apps.undistort import undistort_images
    from cvt_tpu.match.cameras import image_to_world

    h = w = 96
    f_px, cx, cy, k1 = 80.0, 47.5, 47.5, 0.15
    params = np.array([f_px, cx, cy, k1], np.float32)

    def scene(x, y):
        return (0.5 + 0.25 * np.sin(6.0 * x) * np.cos(5.0 * y)
                + 0.25 * np.sin(3.0 * (x + y)))

    # render the DISTORTED capture: each source pixel's undistorted ray
    # (Newton inverse) evaluates the scene
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float32)
    uv = np.stack([uu.ravel(), vv.ravel()], -1)
    xy = np.asarray(image_to_world("simple_radial", params, uv))
    distorted = scene(xy[:, 0], xy[:, 1]).reshape(h, w).astype(np.float32)

    out, newp = undistort_images(distorted[None], "simple_radial", params)
    out = np.asarray(out)[0]
    fx, fy, ncx, ncy = newp
    xg = (uu - ncx) / fx
    yg = (vv - ncy) / fy
    expected = scene(xg, yg).astype(np.float32)

    interior = np.s_[12:-12, 12:-12]
    err = out[interior] - expected[interior]
    psnr = 10 * np.log10(1.0 / max(np.mean(err * err), 1e-12))
    assert psnr > 32.0, psnr
    # multi-channel + batch path
    rgb = np.stack([distorted, distorted * 0.5, distorted + 0.1], -1)
    out2, _ = undistort_images(np.stack([rgb, rgb]), "simple_radial",
                               params)
    assert np.asarray(out2).shape == (2, h, w, 3)
    np.testing.assert_allclose(np.asarray(out2)[0, ..., 0], out,
                               atol=1e-5)


def test_undistort_camera_blank_pixels():
    """blank_pixels=1 keeps every source pixel (smaller focal);
    blank_pixels=0 crops to valid pixels (larger focal) for a
    pincushion k1>0 camera."""
    from cvt_tpu.apps.undistort import undistort_camera
    params = np.array([80.0, 47.5, 47.5, 0.15], np.float32)
    p_crop = undistort_camera("simple_radial", params, 96, 96,
                              blank_pixels=0.0)
    p_full = undistort_camera("simple_radial", params, 96, 96,
                              blank_pixels=1.0)
    assert p_crop[0] > p_full[0]
    assert p_crop[2] == p_full[2] == 47.5
