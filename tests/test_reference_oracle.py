"""Reference-as-oracle fidelity suite.

The strongest accuracy-parity evidence obtainable with zero data egress:
import the reference's own torch modules from /root/reference (read-only) as
oracles, push the SAME random weights through both stacks via the converter,
and assert end-to-end equality of descriptors / similarities / losses /
rerank / PCA. Unlike the hand-derived numpy goldens in test_models_golden.py,
this catches a shared misreading of the reference.

Oracles exercised (reference file:line):
  * EmbedNet / EmbedNetPCA full descriptor chain (ibl/models/netvlad.py:63-110)
  * EmbedRegionNet 9-region train path           (ibl/models/netvlad.py:112-207)
  * NetVLAD centroid/alpha init                  (ibl/models/netvlad.py:34-42)
  * Trainer losses: triplet / sare_joint / sare_ind (ibl/trainers.py:82-162)
  * SFRSTrainer._forward hard+soft losses        (ibl/trainers.py:235-315)
  * PCA train/load/infer, primal + dual          (ibl/pca.py:28-123)
  * k-reciprocal re_ranking                      (ibl/utils/rerank.py:32)

The reference package's __init__ pulls torchvision (absent here), so modules
are imported under namespace-package stubs; torch.symeig (removed in torch 2)
is shimmed onto torch.linalg.eigh and .cuda() onto identity for the PCA
oracle only — the oracle math itself runs unmodified.
"""

import importlib
import os.path as osp
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from openibl_tpu import models
from openibl_tpu.models import convert
from openibl_tpu.ops import losses as our_losses

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF_ROOT), reason="reference checkout not mounted"
)


def load_ref(name):
    """Import a reference module without executing the poisoned __init__s:
    the ibl root (pulls the entire graph) and ibl.models (torchvision) are
    replaced by namespace stubs; torchvision itself — absent from this
    image — is stubbed as an empty module (reference code only touches its
    attributes inside function bodies, e.g. ibl/utils/data/__init__.py:3
    imports it at module scope but uses T.* lazily)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    for mod in ("torchvision", "torchvision.transforms"):
        if mod not in sys.modules:
            sys.modules[mod] = types.ModuleType(mod)
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"
    ]
    for pkg in ("ibl", "ibl.models"):
        if pkg not in sys.modules:
            stub = types.ModuleType(pkg)
            stub.__path__ = [osp.join(REF_ROOT, *pkg.split("."))]
            sys.modules[pkg] = stub
    return importlib.import_module(name)


# ---------------------------------------------------------------------------
# Shared fixtures: a torch backbone with the reference VGG's exact surface
# (truncated torchvision `features` + adaptive max pool, ibl/models/vgg.py:41-70)
# so reference model classes run unmodified and the state dict converts with
# the released-checkpoint key layout (base_model.base.<i>.*).
# ---------------------------------------------------------------------------

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512]


class TorchVGGBase(torch.nn.Module):
    def __init__(self, seed=0):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        layers, cin = [], 3
        for v in VGG16_CFG:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                conv = torch.nn.Conv2d(cin, v, 3, padding=1)
                with torch.no_grad():
                    conv.weight.copy_(torch.randn(conv.weight.shape, generator=g) * 0.05)
                    conv.bias.copy_(torch.randn(conv.bias.shape, generator=g) * 0.05)
                layers += [conv, torch.nn.ReLU(inplace=True)]
                cin = v
        # reference vgg.py:41-42: drop the final ReLU (and the last MaxPool,
        # which torchvision appends after the cfg) from `features`
        self.base = torch.nn.Sequential(*layers[:-1])
        self.gap = torch.nn.AdaptiveMaxPool2d(1)

    def forward(self, x):
        x = self.base(x)
        pool_x = self.gap(x).view(x.size(0), -1)
        return pool_x, x


def _rand_netvlad(ref_netvlad_mod, k, seed):
    nv = ref_netvlad_mod.NetVLAD(num_clusters=k, dim=512)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        nv.conv.weight.copy_(torch.randn(nv.conv.weight.shape, generator=g))
        nv.centroids.copy_(torch.randn(nv.centroids.shape, generator=g))
    return nv


def _images(rng, n, h, w):
    """Raw-pixel-scale images, NCHW float32 (the preprocessing regime both
    stacks expect: ~[0,255] minus mean*255)."""
    return (rng.rand(n, 3, h, w).astype(np.float32) * 255.0) - 117.0


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


@pytest.fixture(scope="module")
def ref_netvlad_mod():
    return load_ref("ibl.models.netvlad")


@pytest.fixture(scope="module")
def ref_trainers_mod():
    return load_ref("ibl.trainers")


# ---------------------------------------------------------------------------
# C2-C4: EmbedNet / EmbedNetPCA descriptor chain
# ---------------------------------------------------------------------------

class TestDescriptorChain:
    K = 8

    def test_embednet_descriptors_match(self, ref_netvlad_mod, rng):
        ref = ref_netvlad_mod.EmbedNet(
            TorchVGGBase(seed=1), _rand_netvlad(ref_netvlad_mod, self.K, 2)
        ).eval()
        ours = models.create("embednet", net_vlad=models.NetVLAD(num_clusters=self.K))
        params = convert.embednet_params_from_torch(ref.state_dict())

        x = _images(rng, 2, 32, 48)
        with torch.no_grad():
            pool_ref, vlad_ref = ref(torch.from_numpy(x))
        pool_ours, vlad_ours = ours.apply(params, _nhwc(x))
        np.testing.assert_allclose(
            np.asarray(vlad_ours), vlad_ref.numpy(), rtol=1e-4, atol=1e-5
        )
        # pool_x is a max over ~1e4-magnitude conv activations computed in a
        # different accumulation order; 1e-3 relative is bit-noise at 1e4 scale
        np.testing.assert_allclose(
            np.asarray(pool_ours), pool_ref.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_embednetpca_descriptors_match(self, ref_netvlad_mod, rng):
        ref = ref_netvlad_mod.EmbedNetPCA(
            TorchVGGBase(seed=3), _rand_netvlad(ref_netvlad_mod, self.K, 4), dim=32
        ).eval()
        ours = models.create(
            "embednetpca", net_vlad=models.NetVLAD(num_clusters=self.K), pca_dim=32
        )
        params = convert.embednetpca_params_from_torch(ref.state_dict())

        x = _images(rng, 2, 32, 48)
        with torch.no_grad():
            desc_ref = ref(torch.from_numpy(x))
        desc_ours = ours.apply(params, _nhwc(x))
        np.testing.assert_allclose(
            np.asarray(desc_ours), desc_ref.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_netvlad_cluster_init_matches(self, ref_netvlad_mod, rng):
        """alpha/centroid bootstrap (ibl/models/netvlad.py:34-42)."""
        clsts = rng.randn(self.K, 512).astype(np.float32)
        descs = rng.randn(100, 512).astype(np.float32)
        nv = ref_netvlad_mod.NetVLAD(num_clusters=self.K, dim=512)
        nv.clsts, nv.traindescs = clsts, descs
        nv._init_params()
        ours = models.netvlad_init_from_clusters(clsts, descs)
        np.testing.assert_allclose(
            np.asarray(ours["assign_w"]).T,
            nv.conv.weight.detach().numpy()[:, :, 0, 0],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ours["centroids"]), nv.centroids.detach().numpy(),
            rtol=1e-6, atol=0,
        )


# ---------------------------------------------------------------------------
# C5: EmbedRegionNet 9-region train path
# ---------------------------------------------------------------------------

class TestRegionNet:
    def test_train_forward_matches(self, ref_netvlad_mod, rng):
        # tuple_size=1 — the published recipe's value AND the only value the
        # reference's .view()-based _forward_train accepts (a T>1 slice is
        # non-contiguous); ours is batch-agnostic, tested at T>1 elsewhere
        T, G, K = 1, 4, 4  # 1 tuple of (anchor, pos, 2 negs)
        ref = ref_netvlad_mod.EmbedRegionNet(
            TorchVGGBase(seed=5), _rand_netvlad(ref_netvlad_mod, K, 6),
            tuple_size=T,
        ).train()
        ours = models.create(
            "embedregionnet", net_vlad=models.NetVLAD(num_clusters=K),
            tuple_size=T,
        )
        params = convert.embednet_params_from_torch(ref.state_dict())

        x = _images(rng, T * G, 32, 32)  # conv5 map 2x2 -> 1x1 quarters
        with torch.no_grad():
            score_ref, va_ref, vp_ref = ref(torch.from_numpy(x))
        score_ours, va_ours, vp_ours = ours.apply_train(params, _nhwc(x))
        np.testing.assert_allclose(
            np.asarray(va_ours), va_ref.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(vp_ours), vp_ref.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(score_ours), score_ref.numpy(), rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# C7: baseline Trainer losses (values AND input gradients)
# ---------------------------------------------------------------------------

class TestBaselineLosses:
    B, NEG, L = 3, 4, 64
    MARGIN = float(np.sqrt(0.1))

    def _desc(self, rng):
        d = rng.randn(self.B, 2 + self.NEG, self.L).astype(np.float32)
        return d / np.linalg.norm(d, axis=-1, keepdims=True)

    @pytest.mark.parametrize("loss_type", ["triplet", "sare_joint", "sare_ind"])
    def test_loss_and_grad_match(self, ref_trainers_mod, rng, loss_type):
        desc = self._desc(rng)
        trainer = ref_trainers_mod.Trainer(model=None, margin=self.MARGIN)
        t_desc = torch.from_numpy(desc.reshape(-1, self.L)).requires_grad_(True)
        loss_ref = trainer._get_loss(t_desc, loss_type, self.B, 2 + self.NEG)
        (grad_ref,) = torch.autograd.grad(loss_ref, t_desc)

        loss_fn = lambda d: our_losses.tuple_loss(d, loss_type, margin=self.MARGIN)
        loss_ours, grad_ours = jax.value_and_grad(loss_fn)(jnp.asarray(desc))
        np.testing.assert_allclose(
            float(loss_ours), float(loss_ref.detach()), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(grad_ours).reshape(-1, self.L), grad_ref.numpy(),
            rtol=1e-4, atol=1e-6,
        )


# ---------------------------------------------------------------------------
# C8: SFRS full _forward (hard + soft) through real region models
# ---------------------------------------------------------------------------

class TestSFRSLosses:
    T, NEG, POS, K = 1, 2, 3, 4  # tuple_size=1: see TestRegionNet note

    def _setup(self, ref_netvlad_mod, ref_trainers_mod):
        student = ref_netvlad_mod.EmbedRegionNet(
            TorchVGGBase(seed=7), _rand_netvlad(ref_netvlad_mod, self.K, 8),
            tuple_size=self.T,
        ).train()
        teacher = ref_netvlad_mod.EmbedRegionNet(
            TorchVGGBase(seed=9), _rand_netvlad(ref_netvlad_mod, self.K, 10),
            tuple_size=self.T,
        ).train()
        ref_tr = ref_trainers_mod.SFRSTrainer(
            student, teacher, margin=float(np.sqrt(0.1)), neg_num=self.NEG,
            temp=[0.07, 0.07, 0.06, 0.05],
        )
        our_model = models.create(
            "embedregionnet", net_vlad=models.NetVLAD(num_clusters=self.K),
            tuple_size=self.T,
        )
        from openibl_tpu.engine.sfrs import SFRSTrainer as OurSFRS

        our_tr = OurSFRS(our_model, loss_type="sare_ind", neg_num=self.NEG,
                         temps=(0.07, 0.07, 0.06, 0.05))
        s_params = convert.embednet_params_from_torch(student.state_dict())
        t_params = convert.embednet_params_from_torch(teacher.state_dict())
        return ref_tr, our_tr, s_params, t_params

    @pytest.mark.parametrize("gen", [0, 2])
    def test_forward_losses_match(self, ref_netvlad_mod, ref_trainers_mod, rng, gen):
        ref_tr, our_tr, s_params, t_params = self._setup(
            ref_netvlad_mod, ref_trainers_mod
        )
        easy = _images(rng, self.T * (2 + self.NEG), 32, 32).reshape(
            self.T, 2 + self.NEG, 3, 32, 32
        )
        diff = _images(rng, self.T * (1 + self.POS), 32, 32).reshape(
            self.T, 1 + self.POS, 3, 32, 32
        )
        # the diff tuple's image 0 is the SAME anchor as the easy tuple's
        # (reference _parse_data, trainers.py:228-233)
        diff[:, 0] = easy[:, 0]

        with torch.no_grad():
            lh_ref, ls_ref = ref_tr._forward(
                torch.from_numpy(easy), torch.from_numpy(diff), "sare_ind", gen
            )

        to_nhwc5 = lambda x: jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        _, (lh_ours, ls_ours) = our_tr._loss_fn(
            s_params, t_params, to_nhwc5(easy), to_nhwc5(diff), gen,
            lambda_soft=0.5,
        )
        np.testing.assert_allclose(
            float(lh_ours), float(lh_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(ls_ours), float(ls_ref), rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# C18: PCA-whitening train/load/infer, primal and dual paths
# ---------------------------------------------------------------------------

class TestPCA:
    def _shim(self, monkeypatch):
        # torch.symeig was removed in torch 2.x; the documented replacement
        # (ascending eigenvalues, same as symeig) keeps the oracle math intact
        monkeypatch.setattr(
            torch, "symeig",
            lambda a, eigenvectors=True, upper=True: torch.linalg.eigh(
                a, UPLO="U" if upper else "L"
            ),
            raising=False,
        )
        # CPU-only torch: .cuda(None) -> identity
        monkeypatch.setattr(
            torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
        )

    @pytest.mark.parametrize("n,d,k", [(60, 24, 8), (16, 48, 8)])  # primal, dual
    def test_projection_matches(self, rng, tmp_path, monkeypatch, n, d, k):
        self._shim(monkeypatch)
        ref_pca_mod = load_ref("ibl.pca")
        x = rng.randn(n, d).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)

        ref = ref_pca_mod.PCA(
            pca_n_components=k, pca_whitening=True,
            pca_parameters_path=str(tmp_path / "pca.h5"),
        )
        ref.train(torch.from_numpy(x.copy()))
        ref.load(gpu=None)
        with torch.no_grad():
            out_ref = ref.infer(torch.from_numpy(x.copy())).numpy()

        from openibl_tpu.ops.pca import PCA as OurPCA

        ours = OurPCA(n_components=k, whiten=True)
        ours.train(x)
        out_ours = np.asarray(ours.infer(x))

        # eigenvector signs are arbitrary and may differ between eigh
        # implementations; distances are sign-invariant, so compare after
        # aligning each whitened component's sign via the outputs themselves
        sign = np.sign(np.sum(out_ref * out_ours, axis=0, keepdims=True))
        np.testing.assert_allclose(out_ours * sign, out_ref, rtol=1e-3, atol=1e-4)
        # and the retrieval-relevant invariant: pairwise distances
        d_ref = np.linalg.norm(out_ref[:, None] - out_ref[None], axis=-1)
        d_ours = np.linalg.norm(out_ours[:, None] - out_ours[None], axis=-1)
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# C17: k-reciprocal re-ranking
# ---------------------------------------------------------------------------

class TestRerank:
    @pytest.mark.parametrize("k1,k2,lam", [(25, 1, 0.3), (20, 6, 0.3)])
    def test_rerank_matches(self, rng, k1, k2, lam):
        ref_rerank_mod = load_ref("ibl.utils.rerank")
        from openibl_tpu.ops.rerank import re_ranking as our_rerank

        q = rng.randn(30, 16).astype(np.float32)
        g = rng.randn(80, 16).astype(np.float32)
        sq = lambda a, b: (
            (a ** 2).sum(1)[:, None] + (b ** 2).sum(1)[None] - 2 * a @ b.T
        )
        q_g, q_q, g_g = sq(q, g), sq(q, q), sq(g, g)
        ref_out = ref_rerank_mod.re_ranking(
            q_g.copy(), q_q.copy(), g_g.copy(), k1=k1, k2=k2, lambda_value=lam
        )
        our_out = our_rerank(q_g, q_q, g_g, k1=k1, k2=k2, lambda_value=lam)
        np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# C11/C12: tuple-mining semantics vs the reference samplers.
# With neg_pool >= the candidate count the reference's random.sample covers
# every candidate, making its mining fully deterministic — so tuples can be
# compared exactly (sampler.py:79-88 pool ∪ cache reduces to "all allowed").
# ---------------------------------------------------------------------------

def _mining_problem(rng, n_q=10, n_g=36, d=8):
    q = rng.randn(n_q, d).astype(np.float32)
    g = rng.randn(n_g, d).astype(np.float32)
    pos_list, neg_list = [], []
    for _ in range(n_q):
        pos = rng.choice(n_g, size=rng.randint(3, 7), replace=False)
        excl = np.unique(np.concatenate(
            [pos, rng.choice(n_g, size=3, replace=False)]
        ))
        pos_list.append(list(map(int, pos)))
        neg_list.append(list(map(int, excl)))
    d2 = ((q[:, None] - g[None]) ** 2).sum(-1)
    return q, g, pos_list, neg_list, d2


class TestSamplerOracle:
    def test_tuple_sampler_matches(self, rng):
        ref_mod = load_ref("ibl.utils.data.sampler")
        from openibl_tpu.data.sampler import TupleSampler

        n_q, n_g, neg_num = 10, 36, 4
        q, g, pos_list, neg_list, d2 = _mining_problem(rng, n_q, n_g)
        sub = [7, 2, 5, 0, 9]

        ref = ref_mod.DistributedRandomTupleSampler(
            list(range(n_q)), list(range(n_g)), pos_list, neg_list,
            neg_num=neg_num, neg_pool=n_g + 10, num_replicas=1, rank=0,
        )
        ref.sort_gallery(torch.from_numpy(np.sqrt(d2)), sub)
        ref_tuples = {t[0]: t for t in ref}

        ours = TupleSampler(n_q, n_g, pos_list, neg_list,
                            neg_num=neg_num, neg_pool=n_g + 10)
        our_tuples = {t[0]: t for t in ours.refresh(q[sub], g, sub)}

        assert set(our_tuples) == set(ref_tuples) == set(sub)
        for a in sub:
            assert our_tuples[a] == ref_tuples[a], (
                f"anchor {a}: ours {our_tuples[a]} ref {ref_tuples[a]}"
            )

    @pytest.mark.parametrize("use_jaccard", [False, True])
    def test_diff_tuple_sampler_matches(self, rng, use_jaccard):
        ref_mod = load_ref("ibl.utils.data.sampler")
        from openibl_tpu.data.sampler import DiffTupleSampler

        n_q, n_g, neg_num, pos_num, pos_pool = 10, 36, 4, 3, 5
        q, g, pos_list, neg_list, d2 = _mining_problem(rng, n_q, n_g)
        # every anchor needs >= pos_num positives for exact comparison
        # (the reference asserts nothing; ours pads — pad path tested in
        # test_data.py)
        for p in pos_list:
            while len(p) < pos_num + 1:
                extra = int(rng.randint(n_g))
                if extra not in p:
                    p.append(extra)
        neg_list = [sorted(set(n) | set(p)) for n, p in zip(neg_list, pos_list)]
        sub = [1, 4, 8]
        jac = rng.rand(n_q, n_g).astype(np.float32)

        ref = ref_mod.DistributedRandomDiffTupleSampler(
            list(range(n_q)), list(range(n_g)), pos_list, neg_list,
            pos_num=pos_num, pos_pool=pos_pool,
            neg_num=neg_num, neg_pool=n_g + 10, num_replicas=1, rank=0,
        )
        # gen 0 in the reference passes the euclidean distmat as the
        # "jaccard" matrix (netvlad_img_sfrs.py:91-93)
        ref_jac = torch.from_numpy(jac if use_jaccard else np.sqrt(d2))
        ref.sort_gallery(torch.from_numpy(np.sqrt(d2)), ref_jac, sub)
        ref_tuples = {t[0]: t for t in ref}

        ours = DiffTupleSampler(n_q, n_g, pos_list, neg_list,
                                pos_num=pos_num, pos_pool=pos_pool,
                                neg_num=neg_num, neg_pool=n_g + 10)
        our_tuples = {
            t[0]: t
            for t in ours.refresh(
                q[sub], g, sub,
                jaccard_rows=(jac if use_jaccard else np.sqrt(d2))[sub],
            )
        }

        assert set(our_tuples) == set(ref_tuples) == set(sub)
        for a in sub:
            ref_t, our_t = ref_tuples[a], our_tuples[a]
            # the reference's gap logic may select FEWER than pos_num
            # difficult positives (sampler.py:163-178 keeps only gap<0/==0
            # entries), yielding a variable-length tuple its own trainer
            # cannot stack (trainers.py:230 torch.stack). Ours pads to the
            # fixed pos_num with the nearest positive — the prefix must be
            # the reference's exact selection, pads must be the top-1 pos.
            assert our_t[: len(ref_t)] == ref_t, (
                f"anchor {a}: ours {our_t} ref {ref_t}"
            )
            assert all(x == our_t[1] for x in our_t[len(ref_t):])


# ---------------------------------------------------------------------------
# C9: recall scan + spatial NMS vs the reference evaluate_all
# (ibl/evaluators.py:132-167)
# ---------------------------------------------------------------------------

class TestEvaluateAllOracle:
    @pytest.mark.parametrize("nms", [False, True])
    def test_recalls_match(self, rng, nms, monkeypatch):
        ref_ev = load_ref("ibl.evaluators")
        monkeypatch.setattr(ref_ev.dist, "get_rank", lambda: 0)
        from openibl_tpu.engine.evaluator import recalls_from_ranks

        n_q, n_g = 40, 120
        distmat = rng.rand(n_q, n_g).astype(np.float32)
        # panorama ids with heavy duplication so NMS actually dedups
        db_pids = [int(p) for p in rng.randint(0, 30, size=n_g)]
        gallery = [(f"img{i}.jpg", pid, 0.0, 0.0)
                   for i, pid in enumerate(db_pids)]
        gt = [rng.choice(n_g, size=rng.randint(1, 5), replace=False)
              for _ in range(n_q)]

        ref_recalls = ref_ev.evaluate_all(
            distmat.copy(), gt, gallery, recall_topk=[1, 5, 10], nms=nms
        )
        order = np.argsort(distmat, axis=1)
        ours = recalls_from_ranks(
            order, gt, gallery_pids=np.asarray(db_pids),
            topk=(1, 5, 10), nms=nms,
        )
        np.testing.assert_allclose(ours, ref_recalls, atol=1e-12)


# ---------------------------------------------------------------------------
# C7 + optimizer: full SGD train-step parity (params after the update)
# ---------------------------------------------------------------------------

class TestTrainStepOracle:
    """Two full optimizer steps: torch.optim.SGD over requires_grad params
    (the reference recipe, examples/netvlad_img.py:164-166, with the conv5
    freeze of ibl/models/vgg.py:20-26) vs our optax chain + trainable mask.
    Asserting the post-step parameter trees equal catches weight-decay
    placement, momentum-buffer convention and freeze-mask drift that the
    loss/grad parity tests cannot see."""

    LR, MOM, WD = 1e-3, 0.9, 1e-3
    T, NEG, K = 1, 2, 4
    MARGIN = float(np.sqrt(0.1))

    def test_sgd_update_matches(self, ref_netvlad_mod, ref_trainers_mod, rng):
        G = 2 + self.NEG
        ref = ref_netvlad_mod.EmbedNet(
            TorchVGGBase(seed=11), _rand_netvlad(ref_netvlad_mod, self.K, 12)
        ).train()
        # reference freeze: everything below features[24] (conv5_1)
        for i, m in enumerate(ref.base_model.base):
            if i < 24:
                for p in m.parameters():
                    p.requires_grad = False
        opt = torch.optim.SGD(
            [p for p in ref.parameters() if p.requires_grad],
            lr=self.LR, momentum=self.MOM, weight_decay=self.WD,
        )
        rtrainer = ref_trainers_mod.Trainer(model=None, margin=self.MARGIN)

        from openibl_tpu.engine.trainer import Trainer as OurTrainer

        ours = models.create(
            "embednet", net_vlad=models.NetVLAD(num_clusters=self.K)
        )
        params = convert.embednet_params_from_torch(ref.state_dict())
        # REAL copies: params are donated to the train step, and np.asarray
        # of a CPU jax array is a zero-copy view of the donated buffer
        before = jax.tree.map(lambda a: np.array(a, copy=True), params)
        trainer = OurTrainer(
            ours, loss_type="sare_ind", margin=self.MARGIN, lr=self.LR,
            momentum=self.MOM, weight_decay=self.WD,
        )
        opt_state = trainer.init(params)

        x = _images(rng, self.T * G, 32, 48)
        x_ours = jnp.asarray(
            np.transpose(x, (0, 2, 3, 1)).reshape(
                self.T, G, 32, 48, 3
            )
        )
        for step in range(2):
            opt.zero_grad()
            _, vlad_ref = ref(torch.from_numpy(x))
            loss_ref = rtrainer._get_loss(vlad_ref, "sare_ind", self.T, G)
            loss_ref.backward()
            opt.step()
            params, opt_state, loss_ours = trainer.step(
                params, opt_state, x_ours
            )
            np.testing.assert_allclose(
                float(loss_ours), float(loss_ref.detach()),
                rtol=1e-4, atol=1e-5, err_msg=f"loss diverged at step {step}"
            )

        after_ref = convert.embednet_params_from_torch(ref.state_dict())
        mask = ours.trainable_mask(params)
        flat_ours = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_ref = jax.tree_util.tree_flatten_with_path(after_ref)[0]
        flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
        flat_mask = jax.tree_util.tree_leaves(mask)
        assert len(flat_ours) == len(flat_ref) == len(flat_mask)
        n_frozen = n_trained = 0
        for (path, ours_leaf), (_, ref_leaf), (_, before_leaf), trainable in zip(
            flat_ours, flat_ref, flat_before, flat_mask
        ):
            name = jax.tree_util.keystr(path)
            if not trainable:
                # frozen on both sides: bit-identical to the pre-step value
                np.testing.assert_array_equal(
                    np.asarray(ours_leaf), before_leaf, err_msg=name
                )
                np.testing.assert_array_equal(
                    np.asarray(ref_leaf), before_leaf, err_msg=name
                )
                n_frozen += 1
            else:
                # trained on both sides: the update actually moved it...
                assert float(
                    np.max(np.abs(np.asarray(ref_leaf) - before_leaf))
                ) > 0.0, f"{name} never moved in the reference"
                # ...and to the same place
                np.testing.assert_allclose(
                    np.asarray(ours_leaf), np.asarray(ref_leaf),
                    rtol=1e-4, atol=2e-6, err_msg=name,
                )
                n_trained += 1
        assert n_trained >= 5 and n_frozen >= 10, (n_trained, n_frozen)

    def test_steplr_boundary_matches(self, ref_netvlad_mod, ref_trainers_mod,
                                     rng):
        """One step on each side of the StepLR decay boundary (epoch 4 at
        base lr, epoch 5 at base*gamma — the published step_size=5 gamma=0.5
        schedule, train_baseline_dist.sh:31-33): catches scheduler off-by-one
        or decay-placement drift the fixed-lr parity test cannot see."""
        G = 2 + self.NEG
        ref = ref_netvlad_mod.EmbedNet(
            TorchVGGBase(seed=13), _rand_netvlad(ref_netvlad_mod, self.K, 12)
        ).train()
        for i, m in enumerate(ref.base_model.base):
            if i < 24:
                for p in m.parameters():
                    p.requires_grad = False
        opt = torch.optim.SGD(
            [p for p in ref.parameters() if p.requires_grad],
            lr=self.LR, momentum=self.MOM, weight_decay=self.WD,
        )
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=5, gamma=0.5)
        rtrainer = ref_trainers_mod.Trainer(model=None, margin=self.MARGIN)

        from openibl_tpu.engine.trainer import Trainer as OurTrainer

        ours = models.create(
            "embednet", net_vlad=models.NetVLAD(num_clusters=self.K)
        )
        params = convert.embednet_params_from_torch(ref.state_dict())
        trainer = OurTrainer(
            ours, loss_type="sare_ind", margin=self.MARGIN, lr=self.LR,
            momentum=self.MOM, weight_decay=self.WD,
        )
        opt_state = trainer.init(params)

        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # StepLR-before-step advisory
            for _ in range(4):  # fast-forward the schedule to epoch 4
                sched.step()

        x = _images(rng, self.T * G, 32, 48)
        x_ours = jnp.asarray(
            np.transpose(x, (0, 2, 3, 1)).reshape(self.T, G, 32, 48, 3)
        )
        for epoch in (4, 5):
            opt_state = trainer.set_epoch_lr(opt_state, epoch, 5, 0.5)
            expect_lr = self.LR * (0.5 if epoch >= 5 else 1.0)
            assert abs(opt.param_groups[0]["lr"] - expect_lr) < 1e-12
            opt.zero_grad()
            _, vlad_ref = ref(torch.from_numpy(x))
            rtrainer._get_loss(vlad_ref, "sare_ind", self.T, G).backward()
            opt.step()
            params, opt_state, _ = trainer.step(params, opt_state, x_ours)
            sched.step()

        after_ref = convert.embednet_params_from_torch(ref.state_dict())
        for (path, ours_leaf), (_, ref_leaf) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(after_ref)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(ours_leaf), np.asarray(ref_leaf),
                rtol=1e-4, atol=2e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_30_step_trajectory_matches(self, ref_netvlad_mod,
                                        ref_trainers_mod, rng):
        """VERDICT r3 #4: a ~30-step mining+training trajectory. The 2-step
        oracle above pins one update; this catches SLOW drift — momentum
        buffers, weight-decay compounding, or descriptor divergence that
        only shows after many coupled updates. The strongest zero-egress
        proxy for the published-recall claim: both stacks consume the
        identical synthetic tuple stream (reference loop
        /root/reference/ibl/trainers.py:24-61), and at steps 10/20 each
        stack re-mines hard tuples FROM ITS OWN descriptors — if the
        trajectories drift, the mined tuples diverge and the assert fires.
        """
        G = 2 + self.NEG
        ref = ref_netvlad_mod.EmbedNet(
            TorchVGGBase(seed=17), _rand_netvlad(ref_netvlad_mod, self.K, 19)
        ).train()
        for i, m in enumerate(ref.base_model.base):
            if i < 24:
                for p in m.parameters():
                    p.requires_grad = False
        opt = torch.optim.SGD(
            [p for p in ref.parameters() if p.requires_grad],
            lr=self.LR, momentum=self.MOM, weight_decay=self.WD,
        )
        rtrainer = ref_trainers_mod.Trainer(model=None, margin=self.MARGIN)

        from openibl_tpu.data.sampler import TupleSampler
        from openibl_tpu.engine.trainer import Trainer as OurTrainer

        ours = models.create(
            "embednet", net_vlad=models.NetVLAD(num_clusters=self.K)
        )
        params = convert.embednet_params_from_torch(ref.state_dict())
        trainer = OurTrainer(
            ours, loss_type="sare_ind", margin=self.MARGIN, lr=self.LR,
            momentum=self.MOM, weight_decay=self.WD,
        )
        opt_state = trainer.init(params)
        fwd_ours = jax.jit(ours.apply)

        h, w = 32, 48
        # a fixed synthetic world: 6 queries + 18 gallery images; the
        # mining geometry (UTM positives/exclusions) is synthetic but fixed.
        # Gallery images are query/noise mixes at DISTINCT ratios: i.i.d.
        # noise images are all nearly equidistant in VLAD space, so the
        # hard-negative ordering there flips on sub-1e-3 descriptor wobble —
        # graded similarity gives the distance gaps a real place gallery has,
        # making mined-tuple equality a drift test instead of a tie-breaker
        # test.
        n_q, n_g = 6, 18
        world_q = _images(rng, n_q, h, w)
        noise = _images(rng, n_g, h, w)
        mix = np.linspace(0.1, 0.9, n_g, dtype=np.float32)[:, None, None, None]
        world_g = mix * world_q[np.arange(n_g) % n_q] + (1 - mix) * noise
        pos_list = [[(3 * i) % n_g, (3 * i + 1) % n_g] for i in range(n_q)]
        neg_list = [sorted(set(p)) for p in pos_list]

        def descriptors(x_nchw):
            """(N, D) from both stacks; asserts they still agree."""
            with torch.no_grad():
                _, v_ref = ref(torch.from_numpy(x_nchw))
            v_ref = torch.nn.functional.normalize(v_ref, dim=1).numpy()
            v_ours = np.asarray(jax.device_get(
                fwd_ours(params, _nhwc(x_nchw))[1]
            ))
            np.testing.assert_allclose(
                v_ours, v_ref, rtol=5e-3, atol=2e-4,
                err_msg="descriptor drift between the stacks",
            )
            return v_ref, v_ours

        def mine(step):
            """Each stack mines from ITS OWN descriptors; tuples must agree
            up to genuine near-ties. Unrelated gallery images sit at nearly
            identical VLAD distances, so a sub-1e-3 descriptor wobble can
            legally swap two negatives — what distinguishes DRIFT from a tie
            is the distance gap: any pick that differs between the stacks
            must be within a tight distance tolerance of the other stack's
            pick (in the SAME descriptor space)."""
            qr, qo = descriptors(world_q)
            gr, go = descriptors(world_g)
            t_ref = TupleSampler(n_q, n_g, pos_list, neg_list, neg_num=2,
                                 neg_pool=8, seed=step).refresh(
                                     qr, gr, np.arange(n_q))
            t_ours = TupleSampler(n_q, n_g, pos_list, neg_list, neg_num=2,
                                  neg_pool=8, seed=step).refresh(
                                      qo, go, np.arange(n_q))
            for a_ref, a_ours in zip(sorted(t_ref), sorted(t_ours)):
                # anchor and easiest-positive must match outright (the
                # graded world gives the positive ranking real gaps)
                assert a_ref[:2] == a_ours[:2], (step, a_ref, a_ours)
                anchor = a_ref[0]
                d = np.sum(np.square(
                    qr[anchor][None] - gr[np.asarray(
                        sorted(set(a_ref[2:]) | set(a_ours[2:]))) - n_q]
                ), axis=1)
                span = {g: dist for g, dist in zip(
                    sorted(set(a_ref[2:]) | set(a_ours[2:])), d)}
                for nr, no in zip(sorted(a_ref[2:], key=span.get),
                                  sorted(a_ours[2:], key=span.get)):
                    assert abs(span[nr] - span[no]) < 5e-3, (
                        f"negatives diverged beyond tie range at step "
                        f"{step}: {a_ref} vs {a_ours}"
                    )
            return t_ours

        world = np.concatenate([world_q, world_g])
        tuples = mine(0)
        losses_ref, losses_ours = [], []
        for step in range(30):
            if step in (10, 20):
                tuples = mine(step)
            # tuple ids are global indices into q_train + db_train — exactly
            # how ``world`` is laid out (anchor < n_q, pos/negs >= n_q)
            tup = tuples[step % len(tuples)]
            x = world[np.asarray(tup)]
            opt.zero_grad()
            _, vlad_ref = ref(torch.from_numpy(x))
            loss_ref = rtrainer._get_loss(vlad_ref, "sare_ind", self.T, G)
            loss_ref.backward()
            opt.step()
            x_ours = _nhwc(x).reshape(self.T, G, h, w, 3)
            params, opt_state, loss_ours = trainer.step(
                params, opt_state, x_ours
            )
            losses_ref.append(float(loss_ref.detach()))
            losses_ours.append(float(loss_ours))
        # the whole loss trajectory stays matched (slow drift would
        # compound into the late steps first)
        np.testing.assert_allclose(
            losses_ours, losses_ref, rtol=2e-3, atol=1e-4,
            err_msg="loss trajectories diverged",
        )
        # final descriptors on held-out images stay matched
        descriptors(_images(rng, 4, h, w))


# ---------------------------------------------------------------------------
# C8 + optimizer: two-generation SFRS trajectory (the flagship method)
# ---------------------------------------------------------------------------

class TestSFRSTrajectoryOracle:
    """Multi-step SFRS parity across a GENERATION boundary: the 30-step
    baseline trajectory above pins the triplet/SARE loop; this pins the full
    SFRS recipe — teacher snapshot + student re-init + fresh optimizer at the
    boundary (netvlad_img_sfrs.py:177-185), hard+soft distillation updates
    (trainers.py:199-204), and gen>0 mining with difficult positives selected
    by k-reciprocal Jaccard (netvlad_img_sfrs.py:200-201 via update_sampler
    rerank=gen>0). Each stack mines positives/negatives FROM ITS OWN
    descriptors, and descriptor agreement is re-asserted at every mining
    point, so slow drift in the coupled student/teacher updates surfaces as
    diverging tuples, descriptors, or loss curves.

    The gen>0 Jaccard matrix is computed ONCE (from the reference stack's
    descriptors) and shared: k-reciprocal set membership is a DISCONTINUOUS
    function of the distances — at this 24-image scale a sub-1e-3 descriptor
    wobble flips a neighbor-set member and jumps a Jaccard value by O(1/k),
    so per-stack Jaccard would compare two chaotic maps, not drift (the
    reference vs itself re-run with a different cudnn autotune pick would
    fail the same comparison). The Jaccard-promotion math itself is pinned
    exactly against the reference sampler in TestSamplerOracle."""

    T, NEG, POS, K = 1, 2, 3, 4
    POS_POOL = 3
    LR, MOM, WD = 1e-3, 0.9, 1e-3
    MARGIN = float(np.sqrt(0.1))
    TEMPS = (0.07, 0.07)
    SOFT = 0.5
    STEPS = 8  # per generation

    def _freeze(self, model):
        for i, m in enumerate(model.base_model.base):
            if i < 24:
                for p in m.parameters():
                    p.requires_grad = False

    def _sgd(self, model):
        return torch.optim.SGD(
            [p for p in model.parameters() if p.requires_grad],
            lr=self.LR, momentum=self.MOM, weight_decay=self.WD,
        )

    @staticmethod
    def _tie_aware(picks_ref, picks_ours, score, tol, what):
        """Any pick differing between the stacks must be a genuine near-tie:
        aligned by score rank, each pair's scores agree within ``tol``."""
        for r, o in zip(sorted(picks_ref, key=score), sorted(picks_ours, key=score)):
            assert abs(score(r) - score(o)) < tol, (
                f"{what} diverged beyond tie range: {picks_ref} vs "
                f"{picks_ours} (|{score(r):.5f} - {score(o):.5f}| >= {tol})"
            )

    def test_two_generation_trajectory_matches(self, ref_netvlad_mod,
                                               ref_trainers_mod, rng):
        from openibl_tpu.data.sampler import DiffTupleSampler
        from openibl_tpu.engine.sfrs import SFRSTrainer as OurSFRS
        from openibl_tpu.ops.rerank import build_v_sparse, jaccard_for_queries

        student = ref_netvlad_mod.EmbedRegionNet(
            TorchVGGBase(seed=21), _rand_netvlad(ref_netvlad_mod, self.K, 22),
            tuple_size=self.T,
        ).train()
        teacher = ref_netvlad_mod.EmbedRegionNet(
            TorchVGGBase(seed=23), _rand_netvlad(ref_netvlad_mod, self.K, 24),
            tuple_size=self.T,
        ).train()
        self._freeze(student)
        ref_tr = ref_trainers_mod.SFRSTrainer(
            student, teacher, margin=self.MARGIN, neg_num=self.NEG,
            temp=list(self.TEMPS),
        )
        opt = self._sgd(student)

        our_model = models.create(
            "embedregionnet", net_vlad=models.NetVLAD(num_clusters=self.K),
            tuple_size=self.T,
        )
        our_tr = OurSFRS(
            our_model, loss_type="sare_ind", neg_num=self.NEG,
            temps=self.TEMPS, soft_weight=self.SOFT,
            lr=self.LR, momentum=self.MOM, weight_decay=self.WD,
        )
        params = convert.embednet_params_from_torch(student.state_dict())
        t_params = convert.embednet_params_from_torch(teacher.state_dict())
        opt_state = our_tr.init_generation(params)
        fwd_ours = jax.jit(our_model.apply)

        # graded synthetic world (see the 30-step test above): gallery images
        # are query/noise mixes at distinct ratios so mined orderings have
        # real distance gaps instead of i.i.d. near-ties
        h, w = 32, 32
        n_q, n_g = 6, 18
        world_q = _images(rng, n_q, h, w)
        noise = _images(rng, n_g, h, w)
        mix = np.linspace(0.1, 0.9, n_g, dtype=np.float32)[:, None, None, None]
        world_g = mix * world_q[np.arange(n_g) % n_q] + (1 - mix) * noise
        world = np.concatenate([world_q, world_g])
        # anchor i's positives are the galleries built FROM query i
        # (ids i, i+6, i+12 at mixes ~0.15/0.4/0.75): their distances to the
        # anchor follow the mix gradient, so the euclid ranking that drives
        # the Jaccard-promotion gap logic has real margins — rank flips then
        # mean drift, not noise (the gap logic is rank-discontinuous)
        pos_list = [sorted({i, i + 6, i + 12}) for i in range(n_q)]
        neg_list = [sorted(set(p)) for p in pos_list]

        def descriptors(x_nchw):
            student.eval()
            with torch.no_grad():
                _, v_ref = student(torch.from_numpy(x_nchw))
            student.train()
            v_ref = v_ref.numpy()
            v_ours = np.asarray(
                jax.device_get(fwd_ours(params, _nhwc(x_nchw))[1])
            )
            np.testing.assert_allclose(
                v_ours, v_ref, rtol=5e-3, atol=2e-4,
                err_msg="descriptor drift between the stacks",
            )
            return v_ref, v_ours

        def jaccard_rows(q_desc, g_desc):
            """gen>0 difficult-positive metric, exactly as the SFRS pipeline
            builds it (engine/pipeline.py mining_jaccard phase)."""
            union = np.concatenate([q_desc, g_desc])
            rows, cols, vals, _, _ = build_v_sparse(union, k1=20)
            jac = jaccard_for_queries(rows, cols, vals, len(union),
                                      np.arange(n_q))
            return jac[:, n_q:]

        def mine(step, gen):
            qr, qo = descriptors(world_q)
            gr, go = descriptors(world_g)
            jac_r = jac_o = None
            if gen > 0:
                jac_r = jac_o = jaccard_rows(qr, gr)  # shared, see docstring
            mk = lambda: DiffTupleSampler(
                n_q, n_g, pos_list, neg_list, pos_num=self.POS,
                pos_pool=self.POS_POOL, neg_num=self.NEG, neg_pool=8,
                seed=step,
            )
            t_ref = mk().refresh(qr, gr, np.arange(n_q), jaccard_rows=jac_r)
            t_ours = mk().refresh(qo, go, np.arange(n_q), jaccard_rows=jac_o)
            for a_ref, a_ours in zip(sorted(t_ref), sorted(t_ours)):
                assert a_ref[:2] == a_ours[:2], (step, a_ref, a_ours)
                anchor = a_ref[0]
                d_gal = np.sum(np.square(qr[anchor][None] - gr), axis=1)
                self._tie_aware(
                    a_ref[2 : 2 + self.NEG], a_ours[2 : 2 + self.NEG],
                    lambda g: d_gal[g - n_q], 5e-3,
                    f"step {step} negatives",
                )
                diff_score = (
                    (lambda g: float(jac_r[anchor][g - n_q])) if gen > 0
                    else (lambda g: d_gal[g - n_q])
                )
                self._tie_aware(
                    a_ref[2 + self.NEG :], a_ours[2 + self.NEG :],
                    diff_score, 5e-3 if gen == 0 else 5e-2,
                    f"step {step} difficult positives",
                )
            return t_ours

        hard_ref, hard_ours, soft_ref, soft_ours = [], [], [], []
        for gen in (0, 1):
            if gen == 1:
                # generation boundary (netvlad_img_sfrs.py:177-185): teacher
                # snapshots the student, the student re-initializes, and the
                # optimizer is rebuilt fresh — on BOTH stacks
                teacher.load_state_dict(student.state_dict())
                t_params = params  # the live tree; never donated again
                fresh = ref_netvlad_mod.EmbedRegionNet(
                    TorchVGGBase(seed=31),
                    _rand_netvlad(ref_netvlad_mod, self.K, 32),
                    tuple_size=self.T,
                )
                student.load_state_dict(fresh.state_dict())
                opt = self._sgd(student)
                params = convert.embednet_params_from_torch(
                    student.state_dict()
                )
                opt_state = our_tr.init_generation(params)
            lam = self.SOFT if gen > 0 else 0.0
            step_fn = our_tr.step_fn(gen)
            tuples = mine(10 * gen, gen)
            for step in range(self.STEPS):
                if step == self.STEPS // 2:
                    tuples = mine(10 * gen + step, gen)
                tup = np.asarray(tuples[step % len(tuples)])
                easy = world[tup[: 2 + self.NEG]][None]  # (T, 2+neg, C, h, w)
                diff = world[
                    np.concatenate([tup[:1], tup[2 + self.NEG :]])
                ][None]
                opt.zero_grad()
                lh_r, ls_r = ref_tr._forward(
                    torch.from_numpy(easy), torch.from_numpy(diff),
                    "sare_ind", gen,
                )
                (lh_r + ls_r * lam).backward()
                opt.step()
                to5 = lambda x: jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
                params, opt_state, lh_o, ls_o = step_fn(
                    params, t_params, opt_state, to5(easy), to5(diff)
                )
                hard_ref.append(float(lh_r.detach()))
                soft_ref.append(float(ls_r.detach()))
                hard_ours.append(float(lh_o))
                soft_ours.append(float(ls_o))

        np.testing.assert_allclose(
            hard_ours, hard_ref, rtol=2e-3, atol=1e-4,
            err_msg="hard-loss trajectories diverged",
        )
        np.testing.assert_allclose(
            soft_ours, soft_ref, rtol=2e-3, atol=1e-4,
            err_msg="soft-loss trajectories diverged",
        )
        # post-trajectory descriptors on held-out images stay matched
        descriptors(_images(rng, 4, h, w))
