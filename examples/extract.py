"""Single-image 4096-d descriptor extraction (TPU equivalent of
/root/reference/examples/extract.py + hubconf.py).

  python examples/extract.py image.jpg --weights vgg16_netvlad.pth
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np
from PIL import Image

from openibl_tpu.hub import DescriptorExtractor


def main():
    p = argparse.ArgumentParser(description="descriptor extraction (TPU)")
    p.add_argument("image", type=str)
    p.add_argument("--weights", type=str, default=None,
                   help=".pth (released torch weights, converted) or .npz")
    p.add_argument("--out", type=str, default=None, help="save .npy")
    args = p.parse_args()

    extractor = DescriptorExtractor(args.weights)
    img = Image.open(args.image).convert("RGB")
    desc = extractor(img)[0]
    print(f"descriptor: shape={desc.shape} norm={np.linalg.norm(desc):.6f}")
    print(desc[:8], "...")
    if args.out:
        np.save(args.out, desc)


if __name__ == "__main__":
    main()
