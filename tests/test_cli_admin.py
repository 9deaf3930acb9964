"""Management CLI surface: vocab_tree_retriever, database
creator/cleaner/merger, image deleter/filterer (exe/vocab_tree.cc:73-184,
exe/database.cc, exe/image.cc:77-203)."""

import json

import numpy as np

from cvt_tpu.cli import main
from cvt_tpu.io.database import FeatureDatabase
from cvt_tpu.match.reconstruction import Point3D, Reconstruction


def _make_db(path, rng, n_images=6, n_kp=40, dim=32):
    pool = rng.normal(size=(n_images, n_kp, dim)).astype(np.float32)
    pool = np.abs(pool) * 40.0
    with FeatureDatabase(path) as db:
        ids = []
        for i in range(n_images):
            iid = db.add_image(f"im{i}.jpg", 640, 480)
            ids.append(iid)
            kp = np.concatenate(
                [rng.uniform(0, 640, (n_kp, 2)),
                 rng.uniform(1, 4, (n_kp, 1)),
                 rng.uniform(-3, 3, (n_kp, 1))], -1).astype(np.float32)
            db.write_keypoints(iid, kp)
            db.write_descriptors(iid, pool[i])
        db.commit()
    return ids, pool


def test_vocab_tree_retriever_cli(tmp_path, rng, capsys):
    dbp = str(tmp_path / "feat.db")
    ids, pool = _make_db(dbp, rng)
    qlist = tmp_path / "queries.txt"
    qlist.write_text("im2.jpg\nim4.jpg\n")
    outidx = str(tmp_path / "index.npz")
    main(["vocab_tree_retriever", "--database", dbp,
          "--query_image_list", str(qlist),
          "--output_index", outidx, "--num_words", "32",
          "--topk", "3"])
    out = capsys.readouterr().out
    # a query image must rank itself first (visual_index_test.cc's
    # self-query invariant)
    lines = out.splitlines()
    for qname in ("im2.jpg", "im4.jpg"):
        qi = next(i for i, ln in enumerate(lines)
                  if f"Querying for image {qname}" in ln)
        assert f"image_name={qname}" in lines[qi + 1]
    # saved index reloads and reproduces the ranking
    main(["vocab_tree_retriever", "--database", dbp,
          "--vocab_index", outidx,
          "--query_image_list", str(qlist), "--topk", "3"])


def test_database_creator_cleaner_merger(tmp_path, rng, capsys):
    db1 = str(tmp_path / "a.db")
    db2 = str(tmp_path / "b.db")
    main(["database_creator", "--database", db1])
    assert json.loads(capsys.readouterr().out)["created"] == db1

    _make_db(db1, rng, n_images=3)
    _make_db(db2, rng, n_images=2)
    with FeatureDatabase(db1) as d:
        ids = [i for i, _ in d.iter_images()]
        d.write_matches(ids[0], ids[1],
                        np.stack([np.arange(5), np.arange(5)], 1))
        d.commit()

    merged = str(tmp_path / "m.db")
    main(["database_merger", "--database1", db1, "--database2", db2,
          "--merged_database", merged])
    out = json.loads(capsys.readouterr().out)
    assert out["n_images"] == 5
    with FeatureDatabase(merged) as m:
        # colliding names from db2 got the _2 suffix; features copied
        names = sorted(n for _, n in m.iter_images())
        assert "im0.jpg" in names and "im0.jpg_2" in names
        for iid, _ in m.iter_images():
            assert m.read_descriptors(iid) is not None

    main(["database_cleaner", "--database", db1, "--type", "matches"])
    capsys.readouterr()
    with FeatureDatabase(db1) as d:
        assert not d.has_matches(ids[0], ids[1])
        assert d.num_images() == 3          # images untouched
    main(["database_cleaner", "--database", db1, "--type", "all"])
    with FeatureDatabase(db1) as d:
        assert d.num_images() == 0


def test_image_deleter_database(tmp_path, rng, capsys):
    dbp = str(tmp_path / "feat.db")
    ids, _ = _make_db(dbp, rng, n_images=4)
    with FeatureDatabase(dbp) as d:
        d.write_matches(ids[0], ids[1],
                        np.stack([np.arange(5), np.arange(5)], 1))
        d.commit()
    namesfile = tmp_path / "del.txt"
    namesfile.write_text("im1.jpg\nmissing.jpg\n")
    main(["image_deleter", "--database", dbp,
          "--image_names_path", str(namesfile)])
    out = capsys.readouterr().out
    assert json.loads(out.splitlines()[-1])["deleted"] == 1
    with FeatureDatabase(dbp) as d:
        assert d.image_id("im1.jpg") is None
        assert not d.has_matches(ids[0], ids[1])   # dependent rows gone
        assert d.num_images() == 3


def _toy_reconstruction(rng, n_images=5):
    rec = Reconstruction()
    for i in range(n_images):
        rec.register_image(i, f"im{i}.jpg", rng.normal(size=3) * 0.05,
                           rng.normal(size=3), rng.normal(size=(12, 2)))
    # images 0-2 see 3 points; images 3-4 see one point each
    rec.points3d[0] = Point3D(np.array([0., 0., 4.]),
                              np.array([[0, 0], [1, 0], [2, 0]]))
    rec.points3d[1] = Point3D(np.array([1., 0., 4.]),
                              np.array([[0, 1], [1, 1], [2, 1]]))
    rec.points3d[2] = Point3D(np.array([0., 1., 4.]),
                              np.array([[0, 2], [1, 2], [2, 2]]))
    rec.points3d[3] = Point3D(np.array([1., 1., 4.]),
                              np.array([[3, 0], [4, 0]]))
    rec._next_pt = 4
    return rec


def test_image_deleter_filterer_reconstruction(tmp_path, rng, capsys):
    rec = _toy_reconstruction(rng)
    inp = str(tmp_path / "rec.npz")
    outp = str(tmp_path / "rec_out.npz")
    rec.save(inp)

    idfile = tmp_path / "ids.txt"
    idfile.write_text("4\n")
    main(["image_deleter", "--input_path", inp, "--output_path", outp,
          "--image_ids_path", str(idfile)])
    capsys.readouterr()
    r2 = Reconstruction.load(outp)
    assert 4 not in r2.images
    assert 3 not in r2.points3d        # track fell below 2 observations

    main(["image_filterer", "--input_path", outp, "--output_path", outp,
          "--min_num_observations", "2"])
    out = capsys.readouterr().out
    assert "Filtered" in out
    r3 = Reconstruction.load(outp)
    # image 3 lost its only point; images 0-2 still see 3 points
    assert sorted(r3.images) == [0, 1, 2]


def test_reconstruction_roundtrip(tmp_path, rng):
    rec = _toy_reconstruction(rng)
    p = str(tmp_path / "r.npz")
    rec.save(p)
    r2 = Reconstruction.load(p)
    assert sorted(r2.images) == sorted(rec.images)
    assert sorted(r2.points3d) == sorted(rec.points3d)
    for iid in rec.images:
        np.testing.assert_allclose(r2.images[iid].keypoints,
                                   rec.images[iid].keypoints)
        assert r2.images[iid].name == rec.images[iid].name
    for pid in rec.points3d:
        np.testing.assert_allclose(r2.points3d[pid].xyz,
                                   rec.points3d[pid].xyz)
        np.testing.assert_array_equal(r2.points3d[pid].track,
                                      rec.points3d[pid].track)
