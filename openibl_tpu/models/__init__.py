"""Model factory — string registry mirroring the reference's
``models.create`` surface (/root/reference/ibl/models/__init__.py:20-53).
"""

from openibl_tpu.models.vgg import VGG16, vgg16_apply, init_vgg16_params, trainable_mask
from openibl_tpu.models.netvlad import (
    NetVLAD,
    EmbedNet,
    EmbedNetPCA,
    EmbedRegionNet,
    netvlad_apply,
    netvlad_init_from_clusters,
    vlad_postprocess,
    region_vlads,
)

__factory = {
    "vgg16": VGG16,
    "netvlad": NetVLAD,
    "embednet": EmbedNet,
    "embednetpca": EmbedNetPCA,
    "embedregionnet": EmbedRegionNet,
}


def names():
    return sorted(__factory.keys())


def create(name, *args, **kwargs):
    """Create a model config instance by name.

    Models are frozen dataclasses exposing ``init(rng) -> params`` and pure
    ``apply(params, x)`` — params live outside the object (functional JAX).
    """
    if name not in __factory:
        raise KeyError(f"Unknown model: {name}")
    return __factory[name](*args, **kwargs)
