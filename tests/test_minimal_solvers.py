"""Minimal solvers (7-pt F, 5-pt E) + guided matching.

Mirrors the reference's synthetic-geometry test style
(retrieval/vlindex/src/estimators/*_test.cc: known two-view pose ->
projected points -> solver recovers the model).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvt_tpu.match import (fit_fundamental_7pt, fit_essential_5pt,
                           solve_cubic_real, sampson_error, match_guided,
                           match_descriptors)


def _synthetic_two_view(n, seed=0, noise=0.0):
    """Random calibrated two-view scene. Returns pts1, pts2 (normalized
    cam coords), E, R, t."""
    rng = np.random.default_rng(seed)
    # modest rotation + translation
    aa = rng.normal(size=3) * 0.2
    th = np.linalg.norm(aa)
    k = aa / (th + 1e-12)
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    r = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t)
    pts3 = rng.uniform([-1, -1, 4], [1, 1, 8], size=(n, 3))
    p1 = pts3[:, :2] / pts3[:, 2:3]
    c2 = pts3 @ r.T + t
    p2 = c2[:, :2] / c2[:, 2:3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e = tx @ r
    e = e / np.linalg.norm(e)
    if noise:
        p1 = p1 + rng.normal(size=p1.shape) * noise
        p2 = p2 + rng.normal(size=p2.shape) * noise
    return (p1.astype(np.float32), p2.astype(np.float32),
            e.astype(np.float32), r, t)


def _algebraic_residual(e, p1, p2):
    x1 = np.concatenate([p1, np.ones((len(p1), 1))], 1)
    x2 = np.concatenate([p2, np.ones((len(p2), 1))], 1)
    return np.abs(np.einsum("ni,ij,nj->n", x2, np.asarray(e), x1))


def test_cubic_roots():
    # (t-1)(t-2)(t-3) = t^3 - 6t^2 + 11t - 6
    roots, valid = solve_cubic_real(1.0, -6.0, 11.0, -6.0)
    r = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(r, [1.0, 2.0, 3.0], atol=1e-4)
    # single real root: t^3 + t  -> 0
    roots, valid = solve_cubic_real(1.0, 0.0, 1.0, 0.0)
    r = np.asarray(roots)[np.asarray(valid)]
    assert len(r) == 1 and abs(r[0]) < 1e-5
    # quadratic fallback: t^2 - 1
    roots, valid = solve_cubic_real(0.0, 1.0, 0.0, -1.0)
    r = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(r, [-1.0, 1.0], atol=1e-5)


def test_fundamental_7pt_recovers_geometry():
    p1, p2, e, _, _ = _synthetic_two_view(7, seed=3)
    f, valid = fit_fundamental_7pt(p1, p2)  # normalized coords: F == E here
    f = np.asarray(f)
    valid = np.asarray(valid)
    assert valid.any()
    # at least one solution reproduces the constraint on the 7 points and
    # matches the true E up to sign/scale
    best = np.inf
    for s in range(3):
        if not valid[s]:
            continue
        res = _algebraic_residual(f[s], p1, p2).max()
        fe = f[s] / np.linalg.norm(f[s])
        d = min(np.linalg.norm(fe - e), np.linalg.norm(fe + e))
        best = min(best, max(res, d))
    assert best < 5e-3, best


def test_fundamental_7pt_batched():
    ps = [_synthetic_two_view(7, seed=s) for s in range(4)]
    p1 = np.stack([p[0] for p in ps])
    p2 = np.stack([p[1] for p in ps])
    f, valid = fit_fundamental_7pt(p1, p2)
    assert f.shape == (4, 3, 3, 3) and valid.shape == (4, 3)
    for b in range(4):
        ok = False
        for s in range(3):
            if valid[b, s]:
                ok |= _algebraic_residual(
                    np.asarray(f[b, s]), ps[b][0], ps[b][1]).max() < 1e-3
        assert ok


def test_essential_5pt_recovers_geometry():
    p1, p2, e, _, _ = _synthetic_two_view(5, seed=1)
    cands, valid = fit_essential_5pt(p1, p2)
    cands = np.asarray(cands)
    valid = np.asarray(valid)
    assert valid.any()
    best = np.inf
    for s in range(10):
        if not valid[s]:
            continue
        d = min(np.linalg.norm(cands[s] - e), np.linalg.norm(cands[s] + e))
        res = _algebraic_residual(cands[s], p1, p2).max()
        best = min(best, max(d, res))
    assert best < 2e-2, best


def test_essential_5pt_batched_vmap():
    ps = [_synthetic_two_view(5, seed=10 + s) for s in range(3)]
    p1 = jnp.asarray(np.stack([p[0] for p in ps]))
    p2 = jnp.asarray(np.stack([p[1] for p in ps]))
    cands, valid = jax.jit(fit_essential_5pt)(p1, p2)
    assert cands.shape == (3, 10, 3, 3)
    for b in range(3):
        found = False
        for s in range(10):
            if valid[b, s]:
                d = min(np.linalg.norm(np.asarray(cands[b, s]) - ps[b][2]),
                        np.linalg.norm(np.asarray(cands[b, s]) + ps[b][2]))
                found |= d < 2e-2
        assert found, b


def test_guided_matching_recovers_ratio_rejects():
    """Guided re-match recovers matches the plain ratio test rejects
    (the reference's reason for guided matching, sift.cc:252-340)."""
    rng = np.random.default_rng(0)
    n = 40
    p1, p2, e, _, _ = _synthetic_two_view(n, seed=5)
    # descriptors: pairs of near-duplicate descriptors so the plain ratio
    # test fails (second-best nearly as good), but the duplicate sits at a
    # geometrically inconsistent location
    base = rng.normal(size=(n, 32)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + rng.normal(size=base.shape).astype(np.float32) * 0.2
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    # query descriptor sits almost exactly between true match and decoy,
    # so the plain Lowe ratio is ~1 and rejects the pair
    d1 = 0.52 * base + 0.48 * dup
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = np.concatenate([base, dup])           # true match + decoy
    # decoys placed far away in image 2
    decoy_pts = p2 + rng.uniform(1.5, 2.0, size=p2.shape).astype(np.float32)
    pts2 = np.concatenate([p2, decoy_pts]).astype(np.float32)

    plain = match_descriptors(d1, d2, ratio=0.8)
    guided = match_guided(d1, d2, p1, pts2, e,
                          model_type="fundamental", max_error=0.01,
                          ratio=0.8)
    n_plain = int(np.asarray(plain.valid).sum())
    n_guided = int(np.asarray(guided.valid).sum())
    assert n_guided > n_plain
    assert n_guided >= int(0.9 * n)
    # guided matches point at the true (first-half) entries
    idx = np.asarray(guided.idx2)[np.asarray(guided.valid)]
    assert (idx < n).mean() > 0.95


def test_guided_matching_homography():
    rng = np.random.default_rng(2)
    n = 30
    h = np.array([[1.1, 0.05, 3.0], [-0.02, 0.95, -2.0], [1e-4, 0.0, 1.0]],
                 np.float32)
    p1 = rng.uniform(0, 100, size=(n, 2)).astype(np.float32)
    x1 = np.concatenate([p1, np.ones((n, 1), np.float32)], 1)
    hx = x1 @ h.T
    p2 = (hx[:, :2] / hx[:, 2:3]).astype(np.float32)
    d1 = rng.normal(size=(n, 16)).astype(np.float32)
    d2 = np.concatenate([d1 + 0.01, d1 + 0.012]).astype(np.float32)
    pts2 = np.concatenate([p2, p2 + 50.0]).astype(np.float32)
    guided = match_guided(d1, d2, p1, pts2, h, model_type="homography",
                          max_error=3.0, ratio=0.9)
    idx = np.asarray(guided.idx2)[np.asarray(guided.valid)]
    assert int(np.asarray(guided.valid).sum()) >= int(0.9 * n)
    assert (idx < n).all()
