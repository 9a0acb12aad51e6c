import os.path as osp

import numpy as np
import jax
import pytest

from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.data import SyntheticStream
from dynaboa_tpu.engine import BilevelEngine
from dynaboa_tpu.engine.checkpoint import load_state, save_state
from dynaboa_tpu.engine.runner import StreamRunner, frame_from_item
from dynaboa_tpu.losses import synthetic_gmm_prior
from dynaboa_tpu.engine import synthetic_store
from dynaboa_tpu.models.hmr import HMR, init_hmr_params
from tests.test_engine import make_smpls, IMG, WIDTH


@pytest.fixture(scope="module")
def engine():
    # cheapest full-path config: bilevel on, extras off -> small XLA program
    cfg = AdaptConfig(dynamic_boa=False, use_meanteacher=False,
                      use_motion=False, retrieval=False,
                      lower_level_mixtrain=False, upper_level_mixtrain=False,
                      record_lowerlevel=False)
    model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
    params = init_hmr_params(model, jax.random.PRNGKey(0),
                             input_shape=(1, IMG, IMG, 3))
    eng = BilevelEngine(cfg, model, synthetic_gmm_prior(seed=4), make_smpls(),
                        synthetic_store(seed=6, img_res=IMG,
                                        feat_dim=8 * WIDTH * 4))
    return eng, params


class TestRunner:
    def test_run_produces_artifacts_and_summary(self, engine, tmp_path):
        eng, params = engine
        stream = SyntheticStream(num_frames=4, img_res=IMG, seed=1)
        runner = StreamRunner(eng, str(tmp_path), save_predictions=True,
                              log_every=2)
        state = eng.init_state(params, img_res=IMG)
        state, summary = runner.run(stream, state)

        assert summary["frames"] == 4
        assert np.isfinite(summary["mpjpe"])
        for f in ("res.npz", "res.txt", "scalars.jsonl",
                  "optim_step_record.npz"):
            assert osp.exists(osp.join(tmp_path, f)), f
        assert osp.exists(osp.join(tmp_path, "result", "Pred_0.npz"))
        pred = np.load(osp.join(tmp_path, "result", "Pred_0.npz"))
        assert pred["verts"].shape[1:] == (256, 3)
        assert int(state.step) == 4

    def test_checkpoint_resume_bit_exact(self, engine, tmp_path):
        eng, params = engine
        stream = SyntheticStream(num_frames=4, img_res=IMG, seed=2)

        # uninterrupted run
        r1 = StreamRunner(eng, str(tmp_path / "a"), log_every=100)
        s_full, _ = r1.run(stream, eng.init_state(params, img_res=IMG))

        # interrupted: 2 frames, checkpoint, then resume for the rest
        r2 = StreamRunner(eng, str(tmp_path / "b"), log_every=100)
        s_half, _ = r2.run(stream, eng.init_state(params, img_res=IMG),
                           max_frames=2)
        ckpt = str(tmp_path / "b" / "checkpoint.npz")
        save_state(ckpt, s_half)

        r3 = StreamRunner(eng, str(tmp_path / "c"), log_every=100)
        s_resumed, _ = r3.run(stream, eng.init_state(params, img_res=IMG),
                              resume_from=ckpt)

        assert int(s_resumed.step) == int(s_full.step) == 4
        for a, b in zip(jax.tree.leaves(s_full.params),
                        jax.tree.leaves(s_resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_state_roundtrip(self, engine, tmp_path):
        eng, params = engine
        state = eng.init_state(params, img_res=IMG)
        p = str(tmp_path / "ck.npz")
        save_state(p, state)
        restored = load_state(p, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frame_from_item_openpose_source(self):
        stream = SyntheticStream(num_frames=1, img_res=IMG, seed=3)
        item = next(iter(stream))
        f_gt = frame_from_item(item, "gt")
        f_op = frame_from_item(item, "openpose")
        np.testing.assert_array_equal(np.asarray(f_gt.j2d[0]),
                                      item["smpl_j2d"])
        np.testing.assert_array_equal(np.asarray(f_op.j2d[0]),
                                      item["op_j2d"])

    def test_reset_state_restores_init(self, engine):
        eng, params = engine
        runner_state = eng.init_state(params, img_res=IMG)
        stream = SyntheticStream(num_frames=1, img_res=IMG, seed=4)
        item = next(iter(stream))
        new_state, _ = eng.step(runner_state, frame_from_item(item))
        reset = eng.init_state(params, img_res=IMG)
        for a, b in zip(jax.tree.leaves(reset.params),
                        jax.tree.leaves(runner_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(reset.step) == 0
