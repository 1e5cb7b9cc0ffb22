"""Pittsburgh / Tokyo .mat parser tests on synthetic dbStruct fixtures.

Builds MATLAB struct files with scipy.io.savemat in the exact field layout of
the NetVLAD-release dbStructs (cell arrays of image paths + 2xN UTM arrays)
and runs the full arrange() -> meta/splits JSON -> load() path.
"""

import os
import os.path as osp

import numpy as np
import pytest
from scipy.io import savemat

from openibl_tpu.data.pitts import Pittsburgh, parse_db_struct
from openibl_tpu.data.tokyo import Tokyo


def _cell(paths):
    """Column cell-array of strings, as loadmat returns for dbStruct images."""
    out = np.empty((len(paths), 1), dtype=object)
    for i, p in enumerate(paths):
        out[i, 0] = np.array([p])
    return out


def _save_pitts_mat(path, q_names, q_utm, db_names, db_utm):
    # field order matches parse_db_struct's positional indexing: the released
    # dbStruct is (whichSet, dbImage, utmDb, qImage, utmQ, numDb, numQ, ...)
    struct = np.array(
        [
            (
                "train",
                _cell(db_names),
                np.asarray(db_utm, np.float64).T,
                _cell(q_names),
                np.asarray(q_utm, np.float64).T,
                float(len(db_names)),
                float(len(q_names)),
            )
        ],
        dtype=[
            ("whichSet", object), ("dbImage", object), ("utmDb", object),
            ("qImage", object), ("utmQ", object), ("numDb", object),
            ("numQ", object),
        ],
    )
    savemat(path, {"dbStruct": struct})


def _save_tokyo_tm_mat(path, db_names, db_utm, q_names, q_utm):
    # TM structs carry an extra timestamp field between dbImage block and
    # qImage (parse offsets +1 for queries, +2 for counts)
    struct = np.array(
        [
            (
                "train",
                _cell(db_names),
                np.asarray(db_utm, np.float64).T,
                np.zeros((1, len(db_names))),  # dbTimeStamp
                _cell(q_names),
                np.asarray(q_utm, np.float64).T,
                np.zeros((1, len(q_names))),  # qTimeStamp
                float(len(db_names)),
                float(len(q_names)),
            )
        ],
        dtype=[
            ("whichSet", object), ("dbImage", object), ("utmDb", object),
            ("dbTimeStamp", object), ("qImage", object), ("utmQ", object),
            ("qTimeStamp", object), ("numDb", object), ("numQ", object),
        ],
    )
    savemat(path, {"dbStruct": struct})


@pytest.fixture
def pitts_root(tmp_path):
    root = tmp_path / "pitts"
    raw = root / "raw"
    os.makedirs(raw)
    # two panoramas per split role; pid = filename prefix before '_'
    grid = lambda i: [float(100 * i), 0.0]
    for split, base in (("train", 0), ("val", 10), ("test", 20)):
        db = [f"{base + j:06d}_pano.jpg" for j in range(2)]
        db_utm = [grid(base + j) for j in range(2)]
        q = [f"q{base + j:06d}_q.jpg" for j in range(2)]
        # queries 5m from their panorama → inside the 25m test radius
        q_utm = [[grid(base + j)[0] + 5.0, 0.0] for j in range(2)]
        _save_pitts_mat(str(raw / f"pitts30k_{split}.mat"), q, q_utm, db, db_utm)
    return str(root)


class TestPittsburghParser:
    def test_parse_db_struct(self, pitts_root):
        s = parse_db_struct(osp.join(pitts_root, "raw", "pitts30k_train.mat"))
        assert s.numDb == 2 and s.numQ == 2
        assert s.dbImage[0] == "000000_pano.jpg"
        assert s.utmDb.shape == (2, 2)

    def test_arrange_and_load(self, pitts_root):
        ds = Pittsburgh(pitts_root, scale="30k", verbose=False)
        assert osp.isfile(osp.join(pitts_root, "meta_30k.json"))
        assert osp.isfile(osp.join(pitts_root, "splits_30k.json"))
        assert len(ds.q_test) == 2 and len(ds.db_test) == 2
        # every test query has its 5m-away panorama as ground truth
        for pos in ds.test_pos:
            assert len(pos) == 1
        # image paths carry the release directory layout
        assert ds.db_test[0][0].startswith(osp.join("Pittsburgh", "images"))
        assert ds.q_test[0][0].startswith(osp.join("Pittsburgh", "queries"))

    def test_idempotent(self, pitts_root):
        a = Pittsburgh(pitts_root, scale="30k", verbose=False)
        b = Pittsburgh(pitts_root, scale="30k", verbose=False)
        assert [x[0] for x in a.q_test] == [x[0] for x in b.q_test]


@pytest.fixture
def tokyo_root(tmp_path):
    root = tmp_path / "tokyo"
    raw = root / "raw"
    os.makedirs(raw)
    # TM: location dirs with timestamp subdirs; paths look like
    # images/LOC/TS/img.jpg (pid = part[1], ts = part[2])
    def tm_paths(loc, ts_list):
        return [f"images/{loc}/{ts}/v.jpg" for ts in ts_list]

    train_db = tm_paths("locA", ["2009", "2010"]) + tm_paths("locB", ["2009"])
    train_utm = [[0.0, 0.0], [0.0, 0.0], [100.0, 0.0]]
    train_q = tm_paths("locA", ["2011"])
    train_q_utm = [[0.0, 0.0]]
    _save_tokyo_tm_mat(str(raw / "tokyoTM_train.mat"), train_db, train_utm,
                       train_q, train_q_utm)
    val_db = tm_paths("locC", ["2009", "2010"])
    val_utm = [[200.0, 0.0]] * 2
    val_q = tm_paths("locC", ["2011"])
    _save_tokyo_tm_mat(str(raw / "tokyoTM_val.mat"), val_db, val_utm,
                       val_q, [[200.0, 0.0]])

    # 24/7: db jpg→png swap; query pid keyed by UTM
    db = ["dir1/a.jpg", "dir1/b.jpg", "dir2/c.jpg"]
    db_utm = [[300.0, 0.0], [300.0, 0.0], [400.0, 0.0]]
    q = ["q1.jpg", "q2.jpg"]
    q_utm = [[305.0, 0.0], [405.0, 0.0]]
    _save_pitts_mat(str(raw / "tokyo247.mat"), q, q_utm, db, db_utm)
    return str(root)


class TestTokyoParser:
    def test_arrange_and_load(self, tokyo_root):
        ds = Tokyo(tokyo_root, verbose=False, seed=0)
        # timestamp sub-identities: locA 2 ts + locB 1 ts = 3 train pids
        assert len(set(p for _, p, _, _ in ds.q_train)) == 3
        # val: locC had 3 timestamps → 1 query + 2 db
        assert len(ds.q_val) == 1 and len(ds.db_val) == 2
        # 24/7 db swapped to .png, grouped by directory
        assert all(f.endswith(".png") for f, _, _, _ in ds.db_test)
        assert len(ds.q_test) == 2
        # each 24/7 query finds its 5m-away panorama group
        assert all(len(p) >= 1 for p in ds.test_pos)
