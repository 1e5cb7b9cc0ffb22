"""NetVLAD centroid bootstrap (TPU equivalent of
/root/reference/examples/cluster.py): sample conv5 descriptors from train
images, k-means to 64 centroids, save the reference-compatible hdf5 cache.

  python examples/cluster.py -d pitts --data-dir data --logs-dir logs
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from openibl_tpu.config import TrainConfig, DataConfig
from openibl_tpu.engine.pipeline import load_dataset, bootstrap_centroids
from openibl_tpu import models


def main():
    p = argparse.ArgumentParser(description="VLAD centroid clustering (TPU)")
    p.add_argument("-d", "--dataset", type=str, default="pitts")
    p.add_argument("-a", "--arch", type=str, default="vgg16",
                   help="backbone (also names the hdf5 cache)")
    p.add_argument("-j", "--workers", type=int, default=2,
                   help="host-side prefetch depth per loader")
    p.add_argument("--scale", type=str, default="30k")
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--logs-dir", type=str, default="logs")
    p.add_argument("--num-clusters", type=int, default=64)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("-b", "--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=43)
    args = p.parse_args()

    cfg = TrainConfig(
        data=DataConfig(dataset=args.dataset, scale=args.scale,
                        data_dir=args.data_dir, height=args.height,
                        width=args.width, test_batch_size=args.batch_size,
                        workers=args.workers),
        arch=args.arch,
        num_clusters=args.num_clusters, init_dir=args.logs_dir,
        logs_dir=args.logs_dir, seed=args.seed,
    )
    dataset = load_dataset(cfg)
    import jax

    base = models.create(args.arch)
    params = base.init(jax.random.PRNGKey(args.seed))
    matconvnet = osp.join(cfg.init_dir, "vd16_offtheshelf_conv5_3_max.pth")
    if osp.isfile(matconvnet):
        import torch

        from openibl_tpu.models import convert

        params = convert.vgg16_params_from_torch(
            torch.load(matconvnet, map_location="cpu", weights_only=False)
        )
    else:
        # the reference always clusters pretrained conv5 descriptors
        # (cluster.py:42-44 via torchvision pretrained=True); random-weight
        # centroids are meaningless for training, so say so loudly
        print(
            f"WARNING: {matconvnet} not found — clustering RANDOM backbone "
            f"descriptors. The resulting centroids are only useful for "
            f"smoke tests; place the MatConvNet weights in --logs-dir for "
            f"a real NetVLAD init.",
            file=sys.stderr,
        )
    centroids, descs = bootstrap_centroids(
        cfg, dataset, base, params, seed=args.seed
    )
    print(f"centroids: {centroids.shape}, descriptors: {descs.shape}")


if __name__ == "__main__":
    main()
