"""Applications round 2: template matching, detection decode+NMS,
motion areas, embeddings, CLI."""

import numpy as np
import jax
import jax.numpy as jnp


def _textured(rng, h=96, w=96, blur=2.0):
    from cvt_tpu.features.scale_space import _blur
    t = np.asarray(_blur(jnp.asarray(
        rng.random((1, h, w)).astype(np.float32)), blur))[0]
    return (t - t.min()) / (np.ptp(t) + 1e-9)


def test_template_matcher_finds_template(rng):
    from cvt_tpu.apps.template_match import TemplateMatcher
    tmpl = _textured(rng, 64, 64)
    # frame 0 contains the template; frame 1 is unrelated
    f0 = _textured(rng, 128, 128) * 0.2
    f0[32:96, 32:96] = tmpl
    f1 = _textured(np.random.default_rng(99), 128, 128)
    frames = np.stack([f0, f1])
    m = TemplateMatcher(tmpl, min_matches=8, use_octave_check=False)
    res = m.match_frames(frames)
    assert res.hits[0], res.n_inliers
    assert res.n_inliers[0] > res.n_inliers[1]
    assert not res.hits[1], res.n_inliers


def test_octave_validate():
    from cvt_tpu.apps.template_match import octave_validate
    sig1 = jnp.ones(20) * 2.0
    sig2 = jnp.concatenate([jnp.ones(15) * 4.0, jnp.ones(5) * 0.5])
    valid = jnp.ones(20, bool)
    keep = np.asarray(octave_validate(sig1, sig2, valid))
    assert keep[:15].all() and not keep[15:].any()


def test_fastestdet_decode_and_nms(rng):
    from cvt_tpu.apps.detect import decode_fastestdet, nms
    b, h, w, nc = 2, 8, 8, 3
    head = np.full((b, h, w, 5 + nc), -6.0, np.float32)
    # one strong detection at cell (2, 3) class 1, another weaker
    # overlapping at (2, 4)
    head[0, 2, 3, 0] = 6.0
    head[0, 2, 3, 3:5] = 0.0    # sigmoid -> 0.5 w/h
    head[0, 2, 3, 5 + 1] = 8.0
    head[0, 2, 4, 0] = 3.0
    head[0, 2, 4, 3:5] = 0.0
    head[0, 2, 4, 5 + 1] = 8.0
    dets = decode_fastestdet(jnp.asarray(head), score_threshold=0.4)
    v0 = np.asarray(dets.valid[0])
    assert v0.sum() == 2
    out = nms(dets, iou_threshold=0.3)
    kept = np.asarray(out.valid[0])
    assert kept.sum() == 1          # overlapping same-class suppressed
    assert int(np.asarray(out.classes[0])[kept.argmax()]) == 1
    # second image has no detections
    assert np.asarray(out.valid[1]).sum() == 0


def test_motion_area_detection(rng):
    from cvt_tpu.apps.motion_area import detect_motion_area
    t, h, w = 10, 64, 80
    frames = np.zeros((t, h, w), np.float32) + 0.5
    # a flickering inner region (the "picture in picture")
    for i in range(t):
        frames[i, 16:40, 20:60] = rng.random((24, 40))
    res = detect_motion_area(jnp.asarray(frames))
    x1, y1, x2, y2 = [int(v) for v in np.asarray(res.box)]
    assert abs(x1 - 20) <= 6 and abs(x2 - 60) <= 6
    assert abs(y1 - 16) <= 6 and abs(y2 - 40) <= 6
    assert float(res.coverage) > 0.8


def test_embedding_extractor(rng):
    from cvt_tpu.features.embedding import EmbeddingExtractor
    ext = EmbeddingExtractor.simple_cnn(dim=32, input_size=64)
    imgs = (rng.random((5, 48, 56, 3)) * 255).astype(np.uint8)
    e = np.asarray(ext.compute(imgs, batch_size=2))
    assert e.shape == (5, 32)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-4)
    # deterministic
    e2 = np.asarray(ext.compute(imgs, batch_size=5))
    np.testing.assert_allclose(e, e2, rtol=1e-4, atol=1e-5)


def test_text_embedding(tmp_path):
    from cvt_tpu.features.embedding import TextEmbedding
    p = tmp_path / "vecs.vec"
    p.write_text("3 4\nhello 1 0 0 0\nworld 0 1 0 0\nfoo 0 0 3 4\n")
    te = TextEmbedding.from_txt(str(p))
    e = np.asarray(te.embed(["foo", "missing", "hello"]))
    np.testing.assert_allclose(e[0], [0, 0, 0.6, 0.8], atol=1e-5)
    np.testing.assert_allclose(e[1], 0.0, atol=1e-6)
    assert abs(np.linalg.norm(e[2]) - 1.0) < 1e-5


def test_cli_end_to_end(tmp_path, rng):
    from cvt_tpu.cli import main
    out = str(tmp_path / "data")
    main(["gen_data", "--n", "2000", "--queries", "50", "--out", out])
    gt = str(tmp_path / "gt.ivecs")
    main(["exact_search", "--base", out + "_base.fvecs",
          "--queries", out + "_query.fvecs", "--k", "10", "--out", gt])
    model = str(tmp_path / "pq.npz")
    main(["pq_train", "--data", out + "_base.fvecs", "--m", "8",
          "--k", "32", "--out", model])
    index = str(tmp_path / "adc.npz")
    main(["build_adc", "--base", out + "_base.fvecs", "--model", model,
          "--out", index])
    main(["search_adc", "--index", index, "--queries",
          out + "_query.fvecs", "--k", "10", "--gt", gt])


def test_config_roundtrip(tmp_path):
    from cvt_tpu.config import Config
    c = Config()
    c.pq.m = 16
    c.sift.max_features = 1024
    p = str(tmp_path / "cfg.json")
    c.save(p)
    c2 = Config.load(p)
    assert c2.pq.m == 16
    assert c2.sift.max_features == 1024
    assert c2.retrieval.max_dist == 0.1


def test_logo_pack_save_load_and_hog(rng, tmp_path):
    """The template model pack (make_model.cc .dat analogue): save a
    LogoDetector's precomputed features + thresholds + HOG, reload
    WITHOUT template images, and get identical detections; the HOG
    secondary decision accepts an affine-matched frame whose SIFT count
    falls short (logo.cc:387-394 rule 3: either signal accepts)."""
    from cvt_tpu.apps.template_match import (LogoDetector, TemplateMatcher,
                                             hog_descriptor)
    tmpl = _textured(rng, 64, 64)
    f0 = _textured(rng, 128, 128) * 0.2
    f0[16:80, 40:104] = tmpl
    f1 = _textured(np.random.default_rng(77), 128, 128)
    frames = np.stack([f0, f1])

    det = LogoDetector({"acme": [tmpl]}, min_matches=8,
                       use_octave_check=False)
    out_orig = det.detect(frames)
    p = str(tmp_path / "logos.npz")
    det.save(p)
    det2 = LogoDetector.load(p)
    out_loaded = det2.detect(frames)
    assert out_orig == out_loaded
    assert "acme" in out_orig[0] and "acme" not in out_orig[1]

    # HOG secondary decision: set the SIFT bar impossibly high; a
    # generous HOG threshold re-accepts the true frame via the warped
    # subwindow's HOG distance, while the unrelated frame stays far
    m_strict = TemplateMatcher(tmpl, min_matches=10_000,
                               use_octave_check=False)
    res_no_hog = m_strict.match_frames(frames)
    assert not res_no_hog.hits.any()
    m_hog = TemplateMatcher(tmpl, min_matches=10_000,
                            use_octave_check=False, hog_threshold=0.8)
    res = m_hog.match_frames(frames)
    assert res.hog_dist is not None
    assert res.hog_dist[0] < res.hog_dist[1], res.hog_dist
    assert res.hits[0] and not res.hits[1], res.hog_dist

    # hog_descriptor basics: unit norm, shift changes it smoothly
    h = np.asarray(hog_descriptor(jnp.asarray(tmpl)))
    np.testing.assert_allclose(np.linalg.norm(h), 1.0, atol=1e-4)
