"""Checkpointing: params / optimizer state / training metadata.

Improves on the reference's torch.save of model-only state
(/root/reference/ibl/utils/serialization.py:31-50, which drops optimizer,
scheduler and sampler cache — noted in SURVEY.md §5): everything needed for a
faithful resume lives in one archive.

Format: npz with one entry per pytree leaf, keyed by its tree path
("params/base/conv1_1/w"), plus a JSON metadata entry. Path-keyed storage
makes loads tolerant and partial — loading just {"params": ...} from a
checkpoint that also holds opt_state works, as does shape-mismatch skipping
(the functional analog of the reference's copy_state_dict,
serialization.py:52-81).
"""

import json
import os
import os.path as osp
import shutil

import numpy as np
import jax


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(path, tree, metadata=None, is_best=False):
    """Save a pytree + metadata; optionally copy to model_best.npz
    (reference save_checkpoint semantics, serialization.py:31-35)."""
    d = osp.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    # NB: None is an empty pytree node in jax — a {'teacher': None} subtree
    # contributes zero leaves here, and a None placeholder in a load target
    # likewise can never be populated from the archive; always pass concrete
    # templates (engine/pipeline.py does).
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in flat:
        arrays["leaf:" + _path_str(p)] = np.asarray(leaf)
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"metadata": metadata or {}}).encode(), dtype=np.uint8
    )
    if not path.endswith(".npz"):
        path = path + ".npz"
    # write-to-tmp + atomic rename: an abort mid-write (Watchdog os._exit,
    # OOM kill, tunnel hang) must never corrupt the previous good checkpoint
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    if is_best:
        best = osp.join(osp.dirname(path) or ".", "model_best.npz")
        shutil.copy(path, best + ".tmp")
        os.replace(best + ".tmp", best)
    return path


def load_checkpoint(path, target_tree, strict=False, verbose=False):
    """Load into the structure of ``target_tree`` by path; leaves absent from
    the archive or with mismatched shapes keep the target's value (tolerant
    merge). Returns (tree, metadata)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        flat, treedef = jax.tree_util.tree_flatten_with_path(target_tree)
        leaves = []
        for p, leaf in flat:
            key = "leaf:" + _path_str(p)
            if key in data.files:
                stored = data[key]
                if np.shape(leaf) != stored.shape:
                    if strict:
                        raise ValueError(
                            f"shape mismatch at {key}: {stored.shape} vs "
                            f"{np.shape(leaf)}"
                        )
                    if verbose:
                        print(f"mismatch at {key}, keeping target")
                    leaves.append(leaf)
                else:
                    leaves.append(stored)
            else:
                if strict:
                    raise KeyError(f"missing {key} in {path}")
                if verbose:
                    print(f"missing {key}, keeping target")
                leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta.get(
        "metadata", {}
    )


def load_metadata(path):
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
    return meta.get("metadata", {})
