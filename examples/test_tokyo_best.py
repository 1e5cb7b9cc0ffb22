"""Evaluate released SFRS weights on Tokyo 24/7 with spatial NMS (TPU
equivalent of /root/reference/examples/test_tokyo_best.py).

  python examples/test_tokyo_best.py --weights vgg16_netvlad.pth --data-dir data
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from test_pitts_best import run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--data-dir", type=str, default="data")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--test-batch-size", type=int, default=32)
    args = p.parse_args()
    run("tokyo", args.weights, args.data_dir, nms=True,
        batch_size=args.test_batch_size, height=args.height,
        width=args.width)


if __name__ == "__main__":
    main()
