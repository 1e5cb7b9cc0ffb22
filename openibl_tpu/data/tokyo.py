"""TokyoTM (train/val) + Tokyo 24/7 (test) dataset.

Mirrors the reference's arrangement (/root/reference/ibl/datasets/tokyo.py):
TokyoTM locations become per-timestamp sub-identities (pid = location dir,
split by timestamp); each val location with >1 timestamp donates one random
timestamp as the query. Tokyo 24/7 is test-only; db filenames swap .jpg→.png
(tokyo.py:118), query pid keyed by UTM pair, db pid by directory.
"""

import os.path as osp
import random
from collections import namedtuple

import numpy as np

from openibl_tpu.data.dataset import Dataset, write_json
from openibl_tpu.data.pitts import read_mat_struct

DbStruct = namedtuple(
    "DbStruct", ["dbImage", "utmDb", "qImage", "utmQ", "numDb", "numQ"]
)


def parse_db_struct(path, time_stamp=True):
    """tokyoTM_*.mat / tokyo247.mat → DbStruct; TM structs carry extra
    timestamp fields shifting the query offsets (reference tokyo.py:12-24)."""
    m = read_mat_struct(path)
    ts = 1 if time_stamp else 0
    return DbStruct(
        dbImage=[f[0].item() for f in m[1]],
        utmDb=m[2].T,
        qImage=[f[0].item() for f in m[3 + ts]],
        utmQ=m[4 + ts].T,
        numDb=m[5 + ts * 2].item(),
        numQ=m[6 + ts * 2].item(),
    )


class Tokyo(Dataset):
    def __init__(self, root, scale=None, verbose=True, seed=None):
        super().__init__(root)
        self._rng = random.Random(seed)
        self.arrange()
        self.load(verbose)

    def arrange(self):
        if self._check_integrity():
            return
        raw_dir = osp.join(self.root, "raw")
        if not osp.isdir(raw_dir):
            raise RuntimeError(f"Dataset not found at {raw_dir}")
        tm_root = osp.join("tokyoTM", "images")
        db_root = osp.join("tokyo247", "images")
        q_root = osp.join("tokyo247", "query")

        identities, utms = [], []
        pids, pids_ts = {}, {}

        def register_tm(split):
            struct = parse_db_struct(
                osp.join(raw_dir, f"tokyoTM_{split}.mat"), time_stamp=True
            )
            images = struct.qImage + struct.dbImage
            coords = np.concatenate([struct.utmQ, struct.utmDb])
            ids = []
            for fpath, utm in zip(images, coords):
                sid = fpath.split("/")[1]  # location dir
                if sid not in pids:
                    pids[sid] = len(identities)
                    pids_ts[sid] = []
                    identities.append([])
                    utms.append(utm.tolist())
                    ids.append(pids[sid])
                ts = fpath.split("/")[2]  # timestamp dir
                if ts not in pids_ts[sid]:
                    pids_ts[sid].append(ts)
                    identities[pids[sid]].append([])
                id_ts = pids_ts[sid].index(ts)
                full = osp.join(tm_root, fpath)
                if full not in identities[pids[sid]][id_ts]:
                    identities[pids[sid]][id_ts].append(full)
                assert utms[pids[sid]] == utm.tolist(), "UTM mismatch"
            return ids

        train_pids = register_tm("train")
        val_pids = register_tm("val")

        # flatten timestamp sub-identities (reference tokyo.py:76-98)
        new_identities, new_utms, new_train = [], [], []
        q_val, db_val = [], []
        for p, identity in enumerate(identities):
            if p in train_pids:
                for sub in identity:
                    new_train.append(len(new_identities))
                    new_identities.append(sorted(sub))
                    new_utms.append(utms[p])
            if p in val_pids:
                if len(identity) > 1:
                    q_idx = self._rng.randrange(len(identity))
                    query = identity.pop(q_idx)
                    q_val.append(len(new_identities))
                    new_identities.append(sorted(query))
                    new_utms.append(utms[p])
                for sub in identity:
                    db_val.append(len(new_identities))
                    new_identities.append(sorted(sub))
                    new_utms.append(utms[p])

        identities, utms = new_identities, new_utms
        train_pids = new_train

        # Tokyo 24/7 test split (reference register_247, tokyo.py:102-131)
        struct = parse_db_struct(osp.join(raw_dir, "tokyo247.mat"), time_stamp=False)
        q_pids, db_pids = {}, {}
        q_test, db_test = [], []
        for fpath, utm in zip(struct.qImage, struct.utmQ):
            sid = f"{utm[0]}_{utm[1]}"
            if sid not in q_pids:
                q_pids[sid] = len(identities)
                identities.append([])
                utms.append(utm.tolist())
                q_test.append(q_pids[sid])
            identities[q_pids[sid]].append(osp.join(q_root, fpath))
            assert utms[q_pids[sid]] == utm.tolist()
        for fpath, utm in zip(struct.dbImage, struct.utmDb):
            sid = osp.dirname(fpath)
            fpath = fpath[:-3] + "png"  # release ships PNGs for the 24/7 db
            if sid not in db_pids:
                db_pids[sid] = len(identities)
                identities.append([])
                utms.append(utm.tolist())
                db_test.append(db_pids[sid])
            identities[db_pids[sid]].append(osp.join(db_root, fpath))
            assert utms[db_pids[sid]] == utm.tolist()

        write_json(
            {"name": "Tokyo", "identities": identities, "utm": utms},
            osp.join(self.root, "meta.json"),
        )
        write_json(
            {
                "q_train": sorted(train_pids),
                "db_train": sorted(train_pids),
                "q_val": sorted(q_val),
                "db_val": sorted(db_val),
                "q_test": sorted(q_test),
                "db_test": sorted(db_test),
            },
            osp.join(self.root, "splits.json"),
        )
