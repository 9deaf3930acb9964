"""PCA train/project/reconstruct + metrics (recall, AUC)."""

import numpy as np

from cvt_tpu.quant import PCA
from cvt_tpu.utils import auc, recall_at_k


def test_pca_recovers_dominant_subspace(rng):
    # data on a noisy 4-d subspace of 32-d space
    basis = np.linalg.qr(rng.normal(size=(32, 4)))[0]
    z = rng.normal(size=(2000, 4)).astype(np.float32) * [10, 7, 5, 3]
    x = (z @ basis.T + 0.01 * rng.normal(size=(2000, 32))).astype(np.float32)
    pca = PCA.train(x, 4)
    y = np.asarray(pca.project(x))
    rec = np.asarray(pca.reconstruct(y))
    rel = np.linalg.norm(rec - x) / np.linalg.norm(x)
    assert rel < 0.01, rel
    # eigenvalues sorted descending
    ev = np.asarray(pca.eigenvalues)
    assert np.all(np.diff(ev) <= 1e-3)


def test_pca_whiten_unit_variance(rng):
    x = rng.normal(size=(5000, 16)).astype(np.float32) * np.linspace(1, 10, 16)
    pca = PCA.train(x, 8, whiten=True)
    y = np.asarray(pca.project(x))
    np.testing.assert_allclose(y.var(axis=0), 1.0, rtol=0.1)


def test_pca_l2norm_and_save_load(tmp_path, rng):
    x = rng.normal(size=(500, 24)).astype(np.float32)
    pca = PCA.train(x, 8)
    y = np.asarray(pca.project(x[:10], l2norm=True))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-4)
    p = str(tmp_path / "pca.npz")
    pca.save(p)
    pca2 = PCA.load(p)
    np.testing.assert_allclose(np.asarray(pca2.project(x[:10])),
                               np.asarray(pca.project(x[:10])), rtol=1e-6)


def test_recall_at_k():
    pred = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    gt = np.array([2, 9, 9])
    assert recall_at_k(pred, gt) == 2 / 3
    assert recall_at_k(pred, gt, k=1) == 0.0


def test_auc_matches_sklearn_semantics(rng):
    """Cross-check the rank formula against the O(n^2) pairwise definition
    used by ctr/compute_auc.py."""
    scores = rng.normal(size=200)
    labels = (rng.random(200) < 0.3).astype(int)
    scores[labels == 1] += 0.5
    # make ties
    scores = np.round(scores, 1)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(auc(labels, scores) - expect) < 1e-12
