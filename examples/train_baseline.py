"""Baseline NetVLAD training: triplet / SARE losses with hard-negative mining.

TPU-native equivalent of /root/reference/examples/netvlad_img.py — argparse
surface kept familiar; all logic lives in openibl_tpu.engine.pipeline.

Usage (published Pitts30k recipe):
  python examples/train_baseline.py -d pitts --scale 30k --loss-type sare_ind
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from openibl_tpu.config import TrainConfig, DataConfig
from openibl_tpu.engine.pipeline import run_baseline_training
from openibl_tpu.parallel.mesh import get_mesh, maybe_init_distributed
from openibl_tpu.utils import Logger


def main():
    p = argparse.ArgumentParser(description="NetVLAD/SARE training (TPU)")
    p.add_argument("-d", "--dataset", type=str, default="pitts")
    p.add_argument("-a", "--arch", type=str, default="vgg16")
    p.add_argument("-j", "--workers", type=int, default=2,
                   help="host-side prefetch depth per loader")
    p.add_argument("--scale", type=str, default="30k")
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--logs-dir", type=str, default="logs")
    p.add_argument("--init-dir", type=str, default="logs")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--tuple-size", type=int, default=1)
    p.add_argument("--test-batch-size", type=int, default=32)
    p.add_argument("--cache-size", type=int, default=1000)
    p.add_argument("--iters", type=int, default=0,
                   help=">0 caps train iterations per subset")
    p.add_argument("--neg-num", type=int, default=10)
    p.add_argument("--neg-pool", type=int, default=1000)
    p.add_argument("--num-clusters", type=int, default=64)
    p.add_argument("--layers", type=str, default="conv5")
    p.add_argument("--loss-type", type=str, default="triplet",
                   choices=["triplet", "sare_ind", "sare_joint"])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-3)
    p.add_argument("--step-size", type=int, default=5)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--margin", type=float, default=0.1)
    p.add_argument("--features", type=int, default=4096)
    p.add_argument("--nowhiten", action="store_true",
                   help="skip whitening in the final PCA reduction")
    p.add_argument("--vlad", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-vlad trains on the global max-pool feature "
                        "(the reference defaults to no-vlad; every published "
                        "recipe passes --vlad, so that is our default)")
    p.add_argument("--deterministic", action="store_true",
                   help="accepted for reference CLI parity; runs are "
                        "always deterministic (seeded streams, XLA)")
    p.add_argument("--eval-step", type=int, default=1)
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 backbone compute")
    p.add_argument("--device-jitter", action="store_true",
                   help="run ColorJitter on the TPU inside the train step "
                        "(host pipeline only decodes + resizes)")
    p.add_argument("--n-devices", type=int, default=None)
    args = p.parse_args()

    maybe_init_distributed()
    cfg = TrainConfig(
        data=DataConfig(
            dataset=args.dataset, scale=args.scale, data_dir=args.data_dir,
            height=args.height, width=args.width,
            test_batch_size=args.test_batch_size, workers=args.workers,
        ),
        arch=args.arch, use_vlad=args.vlad, whiten=not args.nowhiten,
        train_layers=args.layers, num_clusters=args.num_clusters,
        loss_type=args.loss_type, margin_sq=args.margin,
        tuple_size=args.tuple_size, neg_num=args.neg_num,
        neg_pool=args.neg_pool, cache_size=args.cache_size, iters=args.iters,
        epochs=args.epochs, lr=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, step_size=args.step_size,
        eval_step=args.eval_step, seed=args.seed, pca_dim=args.features,
        logs_dir=args.logs_dir, init_dir=args.init_dir, resume=args.resume,
        print_freq=args.print_freq,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        device_jitter=args.device_jitter,
    )
    sys.stdout = Logger(osp.join(cfg.logs_dir, "log.txt"))
    print(f"config: {cfg}")
    mesh = get_mesh(args.n_devices)
    print(f"mesh: {mesh}")
    run_baseline_training(cfg, mesh=mesh)


if __name__ == "__main__":
    main()
