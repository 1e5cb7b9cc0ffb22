"""IO helpers: JSON, MATLAB dbStructs, checkpoint re-exports.

API-parity module for the reference's serialization utilities
(/root/reference/ibl/utils/serialization.py:14-81); the checkpoint functions
live in utils/checkpoint.py (path-keyed npz) and the tolerant state-dict
merge in models/convert.py (merge_params).
"""

from openibl_tpu.data.dataset import read_json, write_json  # noqa: F401
from openibl_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    load_metadata,
)
from openibl_tpu.models.convert import merge_params as copy_state_dict  # noqa: F401


def read_mat(path, key="dbStruct"):
    """Load a MATLAB struct array entry (NetVLAD dbStruct files)."""
    from openibl_tpu.data.pitts import read_mat_struct

    return read_mat_struct(path, key)
