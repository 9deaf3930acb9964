"""Tests for the metric-learning training subsystem (SURVEY.md #30)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cvt_tpu.train import (RecordDataset, RecordWriter, create_state,
                           train_step, make_sharded_train_step, embed,
                           arcface_loss)
from cvt_tpu.parallel.mesh import cpu_mesh


def _toy_data(rng, n_per_class=40, num_classes=4, dim=16):
    centers = rng.normal(size=(num_classes, dim)).astype(np.float32) * 3
    xs, ys = [], []
    for c in range(num_classes):
        xs.append(centers[c] + rng.normal(size=(n_per_class, dim)).astype(
            np.float32))
        ys.append(np.full(n_per_class, c, np.int32))
    return np.concatenate(xs), np.concatenate(ys)


def test_record_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 8)).astype(np.float32)
    y = rng.integers(0, 5, size=17)
    ds = RecordDataset.from_arrays(tmp_path / "r.cvtr", x, y)
    assert len(ds) == 17
    xi, yi = ds[3]
    np.testing.assert_array_equal(xi, x[3])
    assert yi == y[3]
    # batches are fixed-shape and cover each record once per epoch
    seen = []
    for xb, yb in ds.batches(4, seed=1):
        assert xb.shape == (4, 8) and yb.shape == (4,)
        seen.append(xb)
    assert len(seen) == 4


def test_record_writer_labels(tmp_path):
    with RecordWriter(tmp_path / "w.cvtr") as w:
        w.append(b"abc", 2)
        w.append(b"defg", 0)
    ds = RecordDataset(tmp_path / "w.cvtr", decode=lambda b: np.frombuffer(
        b, dtype=np.uint8))
    assert ds.payload(0) == b"abc"
    assert ds.payload(1) == b"defg"
    assert list(ds.labels) == [2, 0]
    assert ds.num_classes == 3


def test_arcface_loss_decreases():
    rng = np.random.default_rng(0)
    x, y = _toy_data(rng)
    state, opt = create_state(jax.random.PRNGKey(0), dim_in=16,
                              num_classes=4, dim_emb=8,
                              optimizer=optax.adam(1e-2))
    loss0 = float(arcface_loss(state.params, jnp.asarray(x), jnp.asarray(y)))
    for _ in range(30):
        state, loss = train_step(state, x, y, opt)
    assert float(loss) < loss0 * 0.5
    # embeddings cluster: same-class cosine > cross-class cosine
    emb = np.asarray(embed(state.params, jnp.asarray(x)))
    sim = emb @ emb.T
    same = sim[y[:, None] == y[None, :]].mean()
    diff = sim[y[:, None] != y[None, :]].mean()
    assert same > diff + 0.2


def test_sharded_train_step_matches_single():
    mesh = cpu_mesh({"dp": 4})
    rng = np.random.default_rng(1)
    x, y = _toy_data(rng, n_per_class=16)
    opt = optax.sgd(1e-2)
    s1, _ = create_state(jax.random.PRNGKey(7), dim_in=16, num_classes=4,
                         dim_emb=8, optimizer=opt)
    s2 = s1
    step = make_sharded_train_step(mesh, opt)
    for _ in range(3):
        s1, l1 = train_step(s1, x, y, opt)
        s2, l2 = step(s2, x, y)
    assert abs(float(l1) - float(l2)) < 1e-4
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
