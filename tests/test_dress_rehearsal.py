"""Launch-day dress rehearsal: the REAL-format asset load path, end to end.

Every other test feeds the system synthetic in-memory stand-ins.  This one
writes fake-but-format-exact copies of every on-disk asset the reference
consumes —

* ``basemodel.pt``: a torch checkpoint with a ``model`` key holding a
  ``module.``-prefixed state dict (DataParallel/l2l conventions,
  reference base_adaptor.py:116-125) plus the init_pose/shape/cam buffers,
* joblib retrieval assets ``cluster_res_random_sample_center_10_10_potocol2.pt``
  (centers + per-cluster index, base_adaptor.py:74-80) and
  ``h36m_random_sample_center_10_10.pt`` (the 100-sample SourceDataset
  archive: imgname/scale/center/pose/shape/S/part, base_adaptor.py:450-555)
  with on-disk H36M crops,
* chumpy-flavoured SMPL pickles (v_template/shapedirs/posedirs/
  scipy-sparse J_regressor/weights/kintree_table/f) pushed through
  ``tools/convert_smpl.py``,
* ``J_regressor_h36m.npy`` / ``J_regressor_extra.npy``,
* 3DPW dataset extras ``3dpw_{seq}_{person}.npz`` + frame images
  (boa_dataset/pw3d.py:19-35 schema)

— then runs ``build_system`` with ``synthetic_fallback=False`` and a few
benchmark frames through the StreamRunner, proving the entire launch-day
load path works on files in the exact shipped formats (with a reduced-width
network; ``load_basemodel`` infers topology from the checkpoint).
"""

import os
import os.path as osp
import pickle
import sys

import numpy as np
import pytest
import torch

from dynaboa_tpu import constants

V = constants.NUM_VERTICES          # real SMPL topology (vertex ids must
                                    # cover constants.VERTEX_JOINT_IDS)
WIDTH = 16
RDIM = 128
XF = WIDTH * 8 * 4                  # pooled feature dim at this width
N_EXEMPLARS = 5
N_CLUSTERS = 3
N_FRAMES = 4


def _write_png(path, rng, size=64):
    import cv2

    img = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    os.makedirs(osp.dirname(path), exist_ok=True)
    assert cv2.imwrite(path, img)


def _make_basemodel(path):
    """Reference-format torch checkpoint (module.-prefixed keys under
    'model', mean-parameter buffers included)."""
    import test_reference_parity as trp

    torch.manual_seed(3)
    net = trp.TorchTapHMR(width=WIDTH, rdim=RDIM).eval()
    sd = {f"module.{k}": v.detach().clone()
          for k, v in net.state_dict_reference_names().items()}
    sd["module.init_pose"] = torch.zeros(1, 144)
    sd["module.init_shape"] = torch.zeros(1, 10)
    sd["module.init_cam"] = torch.tensor([[0.9, 0.0, 0.0]])
    torch.save({"model": sd, "epoch": 7, "batch_idx": 0}, path)
    return net


def _make_smpl_pickles(model_dir, rng):
    """Chumpy-flavoured SMPL pickles, as shipped by the SMPL project."""
    import scipy.sparse as sp

    # a stand-in chumpy module so the pickled objects carry the real
    # module path; tools/convert_smpl.py must load them WITHOUT chumpy
    ch = type(sys)("chumpy")

    class Ch:
        def __init__(self, x):
            self.x = x

    Ch.__module__ = "chumpy"
    Ch.__qualname__ = "Ch"
    ch.Ch = Ch
    sys.modules.setdefault("chumpy", ch)

    os.makedirs(model_dir, exist_ok=True)
    for name in ("SMPL_NEUTRAL.pkl", "SMPL_MALE.pkl", "SMPL_FEMALE.pkl"):
        kintree = np.zeros((2, 24), np.int64)
        kintree[0] = np.array([2 ** 32 - 1] + list(
            np.asarray(_real_parents()[1:])), np.int64)
        kintree[1] = np.arange(24)
        data = {
            "v_template": Ch(rng.normal(size=(V, 3)).astype(np.float64)),
            "shapedirs": Ch(rng.normal(
                scale=1e-2, size=(V, 3, 10)).astype(np.float64)),
            "posedirs": Ch(rng.normal(
                scale=1e-3, size=(V, 3, 207)).astype(np.float64)),
            "J_regressor": sp.csc_matrix(
                np.abs(rng.dirichlet(np.ones(V), size=24))),
            "weights": Ch(rng.dirichlet(np.ones(24), size=V)),
            "kintree_table": kintree,
            "f": np.stack([np.arange(100), np.arange(100) + 1,
                           np.arange(100) + 2], -1).astype(np.uint32),
        }
        with open(osp.join(model_dir, name), "wb") as f:
            pickle.dump(data, f)


def _real_parents():
    from dynaboa_tpu.models.smpl import SMPL_PARENTS

    return SMPL_PARENTS


def _make_retrieval_assets(retrieval_dir, h36m_root, rng):
    import joblib

    os.makedirs(retrieval_dir, exist_ok=True)
    M = N_EXEMPLARS
    imgnames = []
    for i in range(M):
        rel = osp.join("images", f"h36m_{i:04d}.jpg")
        _write_png(osp.join(h36m_root, rel), rng)
        imgnames.append(rel)
    # SourceDataset archive schema (base_adaptor.py:450-509)
    joblib.dump({
        "imgname": np.array(imgnames),
        "scale": rng.uniform(0.25, 0.35, size=M).astype(np.float32),
        "center": rng.uniform(24, 40, size=(M, 2)).astype(np.float32),
        "pose": rng.normal(scale=0.2, size=(M, 72)).astype(np.float32),
        "shape": rng.normal(scale=0.3, size=(M, 10)).astype(np.float32),
        "S": np.concatenate([rng.normal(size=(M, 24, 3)),
                             np.ones((M, 24, 1))], -1).astype(np.float32),
        "part": np.concatenate([rng.uniform(20, 44, size=(M, 24, 2)),
                                np.ones((M, 24, 1))], -1).astype(np.float32),
    }, osp.join(retrieval_dir, "h36m_random_sample_center_10_10.pt"))
    # cluster result schema (base_adaptor.py:74-80)
    members = np.array_split(np.arange(M), N_CLUSTERS)
    joblib.dump({
        "centers": rng.normal(size=(N_CLUSTERS, XF)).astype(np.float32),
        "index": [np.asarray(ix) for ix in members],
        "feats": rng.normal(size=(M, XF)).astype(np.float32),
    }, osp.join(
        retrieval_dir, "cluster_res_random_sample_center_10_10_potocol2.pt"))


def _make_3dpw(npz_dir, img_root, rng):
    os.makedirs(npz_dir, exist_ok=True)
    n = N_FRAMES
    imgnames = []
    for i in range(n):
        rel = osp.join("imageFiles", "courtyard_test_00",
                       f"image_{i:05d}.jpg")
        _write_png(osp.join(img_root, rel), rng)
        imgnames.append(rel)
    np.savez(
        osp.join(npz_dir, "3dpw_0_0.npz"),
        imgname=np.array(imgnames),
        scale=rng.uniform(0.25, 0.35, size=n).astype(np.float32),
        center=rng.uniform(24, 40, size=(n, 2)).astype(np.float32),
        pose=rng.normal(scale=0.2, size=(n, 72)).astype(np.float32),
        shape=rng.normal(scale=0.3, size=(n, 10)).astype(np.float32),
        j2d=np.concatenate([rng.uniform(20, 44, size=(n, 49, 2)),
                            np.ones((n, 49, 1))], -1).astype(np.float32),
        op_j2d=np.concatenate([rng.uniform(20, 44, size=(n, 49, 2)),
                               np.ones((n, 49, 1))], -1).astype(np.float32),
        gender=np.array(["m", "f", "m", "f"][:n]),
    )


@pytest.fixture(scope="module")
def asset_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    rng = np.random.default_rng(11)

    _make_basemodel(str(root / "basemodel.pt"))
    _make_smpl_pickles(str(root / "smpl_pkl"), rng)
    np.save(root / "J_regressor_extra.npy",
            np.abs(rng.dirichlet(np.ones(V), size=9)).astype(np.float32))
    np.save(root / "J_regressor_h36m.npy",
            np.abs(rng.dirichlet(np.ones(V), size=17)).astype(np.float32))

    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    import convert_smpl

    smpl_npz = root / "smpl_npz"
    os.makedirs(smpl_npz)
    for src, dst in (("SMPL_NEUTRAL.pkl", "smpl_neutral.npz"),
                     ("SMPL_MALE.pkl", "smpl_male.npz"),
                     ("SMPL_FEMALE.pkl", "smpl_female.npz")):
        convert_smpl.convert_one(str(root / "smpl_pkl" / src),
                                 str(smpl_npz / dst),
                                 str(root / "J_regressor_extra.npy"))

    _make_retrieval_assets(str(root / "retrieval_res"), str(root / "h36m"),
                           rng)
    _make_3dpw(str(root / "dataset_extras"), str(root / "3dpw"), rng)
    return root


class TestDressRehearsal:
    def _paths(self, root):
        from dynaboa_tpu.config import Paths

        return Paths(
            pw3d_root=str(root / "3dpw"),
            h36m_root=str(root / "h36m"),
            dataset_npz_path=str(root / "dataset_extras"),
            retrieval_res=str(root / "retrieval_res"),
            smpl_model_dir=str(root / "smpl_npz"),
            joint_regressor_h36m=str(root / "J_regressor_h36m.npy"),
            basemodel=str(root / "basemodel.pt"),
        )

    def test_loaders_roundtrip(self, asset_tree):
        """Weights load through the converter and match the torch source;
        SMPL npz carries the real topology; the store is format-faithful."""
        import jax.numpy as jnp

        from dynaboa_tpu.models.hmr import load_basemodel
        from dynaboa_tpu.models.smpl import load_smpl_npz

        model, params = load_basemodel(str(asset_tree / "basemodel.pt"))
        assert model.layers == (1, 1, 1, 1)
        assert model.width == WIDTH and model.regressor_dim == RDIM
        # spot-check one converted leaf against the torch file
        ckpt = torch.load(str(asset_tree / "basemodel.pt"),
                          weights_only=False)
        w = ckpt["model"]["module.conv1.weight"].numpy()
        np.testing.assert_allclose(
            np.asarray(params["conv1"]["kernel"]), w.transpose(2, 3, 1, 0))

        smpl = load_smpl_npz(str(asset_tree / "smpl_npz" / "smpl_neutral.npz"))
        assert smpl.v_template.shape == (V, 3)
        assert smpl.posedirs.shape == (207, V * 3)
        assert smpl.J_regressor_extra.shape == (9, V)
        assert smpl.parents[0] == -1

    def test_build_system_all_real(self, asset_tree):
        """build_system must find EVERY real asset (synthetic == all False)
        and the engine must adapt on real-format 3DPW frames."""
        from dynaboa_tpu.apps.common import build_system
        from dynaboa_tpu.config import AdaptConfig
        from dynaboa_tpu.data import PW3DStream
        from dynaboa_tpu.engine.runner import StreamRunner

        cfg = AdaptConfig(optim_steps=1, interval=2,
                          record_lowerlevel=False)
        system = build_system(cfg, self._paths(asset_tree),
                              synthetic_fallback=False)
        assert system.synthetic == {
            "weights": False, "smpl": False, "prior": False,
            "retrieval": False}
        assert int(system.store.centers.shape[1]) == XF
        assert int(system.store.bank.images.shape[0]) == N_EXEMPLARS

        stream = PW3DStream(str(asset_tree / "dataset_extras"),
                            str(asset_tree / "3dpw"))
        assert len(stream) == N_FRAMES

        exppath = str(asset_tree / "exp")
        runner = StreamRunner(system.engine, exppath, log_every=10_000)
        state = system.engine.init_state(system.params)
        state, summary = runner.run(stream, state)
        assert summary["frames"] == N_FRAMES
        assert np.isfinite(summary["mpjpe"])
        assert np.isfinite(summary["pampjpe"])
        assert osp.exists(osp.join(exppath, "res.txt"))
        assert int(np.asarray(state.step)) == N_FRAMES
