"""Evaluate released SFRS weights on Pitts250k-test (TPU equivalent of
/root/reference/examples/test_pitts_best.py — this environment has no network
egress, so pass the downloaded vgg16_netvlad.pth explicitly).

  python examples/test_pitts_best.py --weights vgg16_netvlad.pth --data-dir data
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

from openibl_tpu import data as datasets
from openibl_tpu.data.loader import ImageSource, BatchLoader, PaddedBatchLoader
from openibl_tpu.data.transforms import TestTransform
from openibl_tpu.engine.evaluator import Evaluator
from openibl_tpu.hub import vgg16_netvlad
from openibl_tpu.parallel.mesh import get_mesh


def run(dataset_name, weights, data_dir, scale=None, nms=False,
        batch_size=32, height=480, width=640, n_devices=None):
    model, params = vgg16_netvlad(weights)
    root = osp.join(data_dir, dataset_name)
    kwargs = {"scale": scale} if dataset_name == "pitts" else {}
    dataset = datasets.create(dataset_name, root, **kwargs)
    tokyo = dataset_name == "tokyo"
    q_src = ImageSource(dataset.q_test, dataset.images_dir,
                        TestTransform(height, width, tokyo=tokyo))
    db_src = ImageSource(dataset.db_test, dataset.images_dir,
                         TestTransform(height, width))
    # Tokyo's variable-shape queries run bucket-padded + masked, so the full
    # eval (queries included) shards over the mesh on both datasets
    q_loader = (PaddedBatchLoader if tokyo else BatchLoader)(
        q_src, batch_size=batch_size
    )
    evaluator = Evaluator(
        model.apply, mesh=get_mesh(n_devices),
        masked_apply_fn=model.apply_masked if tokyo else None,
    )
    return evaluator.evaluate(
        params,
        q_loader,
        BatchLoader(db_src, batch_size=batch_size),
        dataset.test_pos,
        gallery_pids=[it[1] for it in dataset.db_test],
        nms=nms,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--scale", type=str, default="250k")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--test-batch-size", type=int, default=32)
    args = p.parse_args()
    run("pitts", args.weights, args.data_dir, scale=args.scale,
        batch_size=args.test_batch_size, height=args.height,
        width=args.width)


if __name__ == "__main__":
    main()
