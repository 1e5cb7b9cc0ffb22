"""One-shot released-weights descriptor-parity check (VERDICT r4 missing #3).

The reference publishes vgg16_netvlad.pth (hubconf.py:5-11); this
environment has no egress, so the converter is validated only against
random-weight torch oracles (tests/test_convert_hub.py). THE MOMENT a
released checkpoint lands on a host, run this first:

    python scripts/hub_parity_check.py /path/to/vgg16_netvlad.pth

It loads the SAME weights into (a) the torch reference model graph (imported
from /root/reference under the oracle stubs — no torchvision needed) and
(b) our hub model via the on-the-fly converter, pushes identical
pixel-scale images through both, and reports descriptor max-abs-diff and
cosine. PASS = cosine > 0.9999 on every probe image.

Exit code 0 on pass, 1 on fail — safe to gate a reproduction run on.
"""

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="released vgg16_netvlad.pth (or any "
                                      "torch EmbedNetPCA state dict)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--images", type=int, default=4)
    p.add_argument("--cpu", action="store_true",
                   help="force our stack onto CPU (bit-closest comparison; "
                        "default uses the ambient backend)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from test_reference_oracle import load_ref, TorchVGGBase

    from openibl_tpu.hub import vgg16_netvlad
    from openibl_tpu.models.convert import load_torch_checkpoint

    state = load_torch_checkpoint(args.checkpoint)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]

    # torch reference graph with the released weights
    ref_nv = load_ref("ibl.models.netvlad")
    tmodel = ref_nv.EmbedNetPCA(
        TorchVGGBase(seed=0), ref_nv.NetVLAD(num_clusters=64, dim=512),
        dim=4096,
    )
    missing, unexpected = tmodel.load_state_dict(
        {k.replace("module.", ""): v for k, v in state.items()}, strict=False
    )
    if unexpected:
        print(f"WARNING: unexpected keys ignored: {sorted(unexpected)[:5]}...")
    if missing:
        print(f"FAIL: reference graph missing keys: {sorted(missing)[:5]}...")
        sys.exit(1)
    tmodel.eval()

    # our hub model via the converter
    model, params = vgg16_netvlad(args.checkpoint)
    fwd = jax.jit(model.apply)

    rng = np.random.RandomState(0)
    worst_cos, worst_diff = 1.0, 0.0
    for i in range(args.images):
        x = (rng.rand(1, 3, args.height, args.width).astype(np.float32)
             * 255.0) - 117.0
        with torch.no_grad():
            d_ref = tmodel(torch.from_numpy(x)).numpy()[0]
        d_ours = np.asarray(
            fwd(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        )[0]
        cos = float(np.dot(d_ref, d_ours)
                    / (np.linalg.norm(d_ref) * np.linalg.norm(d_ours)))
        diff = float(np.max(np.abs(d_ref - d_ours)))
        worst_cos, worst_diff = min(worst_cos, cos), max(worst_diff, diff)
        print(f"image {i}: cosine {cos:.6f}  max|diff| {diff:.2e}")

    ok = worst_cos > 0.9999
    print(f"{'PASS' if ok else 'FAIL'}: worst cosine {worst_cos:.6f}, "
          f"worst max|diff| {worst_diff:.2e}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
