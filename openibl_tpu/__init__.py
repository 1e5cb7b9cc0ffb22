"""openibl_tpu — a TPU-native visual place recognition framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of OpenIBL
(reference: /root/reference): VGG16 + NetVLAD descriptors, PCA whitening,
weakly-supervised training (triplet / SARE / SFRS self-distillation) with
hard-negative mining, and a TPU-resident retrieval/eval engine.

Design stance (see SURVEY.md §7): functional core (pure ``apply(params, x)``),
explicit ``jax.sharding.Mesh`` data parallelism over ICI, Pallas kernels for
the NetVLAD head and tiled kNN, host-side input pipeline, typed config.
"""

__version__ = "0.1.0"

from openibl_tpu import models, ops, data, engine, parallel, utils  # noqa: F401
