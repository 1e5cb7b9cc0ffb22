"""Retrieval evaluation engine: TPU-resident kNN + Recall@N.

Replaces the reference's CPU distmat/argsort pipeline
(/root/reference/ibl/evaluators.py:105-201) with streaming top-k on device:
only the top max(topk)·(12 if NMS) neighbors per query are ever materialized
(ops.distance.topk_nearest). Spatial NMS and the recall scan are cheap host
index math. The optional k-reciprocal rerank path computes the three full
distance matrices on device and reranks on host (ops.rerank, C++-accelerated).
"""

import numpy as np
import jax.numpy as jnp

from openibl_tpu.ops.distance import topk_nearest, pairwise_sqdist
from openibl_tpu.parallel.extract import extract_features


def spatial_nms(pred, db_ids, top_n):
    """Keep the first occurrence of each panorama id among the top ``top_n``
    predictions (reference spatial_nms, evaluators.py:132-140)."""
    seen = set()
    out = []
    for p in pred[:top_n]:
        pid = db_ids[p]
        if pid not in seen:
            seen.add(pid)
            out.append(p)
    return out


def recalls_from_ranks(sorted_idx, ground_truth, gallery_pids=None,
                       topk=(1, 5, 10), nms=False):
    """Recall@k given per-query ranked gallery indices.

    Matches evaluate_all (evaluators.py:142-167): a query counts for every
    k >= the rank bucket of its first true positive; NMS first dedups by
    panorama id over the top 12*max(topk)."""
    topk = list(topk)
    if nms and gallery_pids is None:
        # fail before the caller wastes a full-gallery kNN: spatial_nms
        # dedups by panorama id and has nothing to dedup by without them
        raise ValueError("nms=True requires gallery_pids")
    correct_at_n = np.zeros(len(topk))
    for q, pred in enumerate(sorted_idx):
        pred = list(pred)
        if nms:
            pred = spatial_nms(pred, gallery_pids, max(topk) * 12)
        gt = set(ground_truth[q])
        for i, k in enumerate(topk):
            if any(p in gt for p in pred[:k]):
                correct_at_n[i:] += 1
                break
    return correct_at_n / len(sorted_idx)


# host-RAM budget for the materializing rerank path. Its PEAK holds the
# three input distance matrices (together one n^2 f32 block) plus
# re_ranking's own (n, n) normalized copy and the (n_q, n) jaccard output
# simultaneously — ~2x4n^2 bytes, not 4n^2 (Pitts250k union ~91k -> ~66 GB
# peak); the streaming rerank computes the same math from features without
# materializing any of them
_RERANK_DISTMAT_BUDGET_BYTES = 2 * 1024**3


def evaluate_descriptors(q_feats, g_feats, ground_truth, gallery_pids=None,
                         topk=(1, 5, 10), nms=False, rerank=False,
                         rr_topk=25, lambda_value=0, print_results=True,
                         mesh=None):
    """End-to-end recall from descriptor arrays.

    With ``mesh`` the gallery is sharded across devices and kNN merged over
    ICI (ops.distance.topk_nearest_sharded) — each device holds G/n rows.
    In multi-process runs a global mesh is reduced to this process's
    sub-mesh: the descriptors are host-resident (already all-gathered), so
    every host runs the identical kNN redundantly on its own devices."""
    if nms and gallery_pids is None:
        raise ValueError("nms=True requires gallery_pids")  # before the kNN
    if mesh is not None:
        from openibl_tpu.parallel.mesh import process_local_mesh

        mesh = process_local_mesh(mesh)  # no-op single-process
    k_need = max(topk) * (12 if nms else 1)
    if mesh is not None and mesh.size > 1:
        from openibl_tpu.ops.distance import topk_nearest_sharded

        g = np.asarray(g_feats, np.float32)
        pad = (-len(g)) % mesh.size
        if pad:
            # pad rows far from any unit-norm query (d² would be huge)
            g = np.concatenate([g, np.full((pad, g.shape[1]), 1e3, np.float32)])
        _, idx = topk_nearest_sharded(
            jnp.asarray(q_feats), jnp.asarray(g), mesh,
            k=min(k_need, len(g_feats)),
        )
    else:
        _, idx = topk_nearest(jnp.asarray(q_feats), jnp.asarray(g_feats),
                              k=min(k_need, len(g_feats)))
    recalls = recalls_from_ranks(np.asarray(idx), ground_truth, gallery_pids,
                                 topk, nms)
    if print_results:
        _print_recalls(recalls, topk)
    if not rerank:
        return recalls

    # k-reciprocal rerank (reference Evaluator.evaluate,
    # evaluators.py:194-199; distances enter squared, matching
    # pairwise_distance's output). Small problems materialize the three
    # distance matrices; past the memory budget the streaming path computes
    # the identical math from the descriptors (Pitts250k's g-g alone is
    # ~27 GB f32 — the reference simply cannot rerank at that scale)
    n_union = len(q_feats) + len(g_feats)
    if 8 * n_union * n_union > _RERANK_DISTMAT_BUDGET_BYTES:
        from openibl_tpu.ops.rerank import rerank_ranks_streaming

        order, _ = rerank_ranks_streaming(
            q_feats, g_feats, k1=rr_topk, k2=1,
            lambda_value=lambda_value, k_out=k_need,
        )
    else:
        from openibl_tpu.ops.rerank import composite_rank_key, re_ranking

        d_qg = np.asarray(pairwise_sqdist(q_feats, g_feats))
        d_qq = np.asarray(pairwise_sqdist(q_feats, q_feats))
        d_gg = np.asarray(pairwise_sqdist(g_feats, g_feats))
        final = re_ranking(d_qg, d_qq, d_gg, k1=rr_topk, k2=1,
                           lambda_value=lambda_value)
        # same float64 original-distance tie-break key as the streaming
        # path, so results are identical on either side of the threshold
        key = composite_rank_key(final, d_qg)
        order = np.argsort(key, axis=1)[:, :k_need]
    recalls = recalls_from_ranks(order, ground_truth, gallery_pids, topk, nms)
    if print_results:
        print("after re-ranking:")
        _print_recalls(recalls, topk)
    return recalls


def _print_recalls(recalls, topk):
    print("Recall Scores:")
    for k, r in zip(topk, recalls):
        print(f"  top-{k:<4}{r:12.1%}")


class Evaluator:
    """Binds a model apply fn + mesh; evaluates loaders end to end
    (reference Evaluator, evaluators.py:171-201)."""

    def __init__(self, apply_fn, mesh=None, feature="vlad",
                 masked_apply_fn=None):
        self.apply_fn = apply_fn
        self.mesh = mesh
        self.feature = feature
        self.masked_apply_fn = masked_apply_fn

    def extract(self, params, loader, pca=None, verbose=False):
        return extract_features(self.apply_fn, params, loader,
                                mesh=self.mesh, pca=pca,
                                feature=self.feature, verbose=verbose,
                                masked_apply_fn=self.masked_apply_fn)

    def evaluate(self, params, query_loader, gallery_loader, ground_truth,
                 gallery_pids=None, pca=None, topk=(1, 5, 10), nms=False,
                 rerank=False, rr_topk=25, lambda_value=0, verbose=False,
                 print_results=True):
        q_feats = self.extract(params, query_loader, pca=pca, verbose=verbose)
        g_feats = self.extract(params, gallery_loader, pca=pca, verbose=verbose)
        return evaluate_descriptors(
            q_feats, g_feats, ground_truth, gallery_pids, topk=topk, nms=nms,
            rerank=rerank, rr_topk=rr_topk, lambda_value=lambda_value,
            mesh=self.mesh, print_results=print_results,
        )

    def evaluate_sources(self, params, q_source, db_source, ground_truth,
                         gallery_pids=None, pca=None, batch_size=32,
                         prefetch=2, topk=(1, 5, 10), nms=False, rerank=False,
                         rr_topk=25, lambda_value=0, verbose=False,
                         print_results=True):
        """Like ``evaluate`` but from ImageSources: extraction is sharded
        across hosts in multi-process runs (each host extracts a contiguous
        slice and the features are all-gathered — the reference splits eval
        the same way, ibl/evaluators.py:88-101). Use this in the training
        pipelines; the loader-based ``evaluate`` stays for the masked
        variable-shape (Tokyo) test entry."""
        from openibl_tpu.parallel.extract import extract_features_sharded

        q_feats = extract_features_sharded(
            self.apply_fn, params, q_source, batch_size=batch_size,
            mesh=self.mesh, pca=pca, feature=self.feature, verbose=verbose,
            prefetch=prefetch,
        )
        g_feats = extract_features_sharded(
            self.apply_fn, params, db_source, batch_size=batch_size,
            mesh=self.mesh, pca=pca, feature=self.feature, verbose=verbose,
            prefetch=prefetch,
        )
        return evaluate_descriptors(
            q_feats, g_feats, ground_truth, gallery_pids, topk=topk, nms=nms,
            rerank=rerank, rr_topk=rr_topk, lambda_value=lambda_value,
            mesh=self.mesh, print_results=print_results,
        )
