import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.engine import BilevelEngine, synthetic_store
from dynaboa_tpu.losses import synthetic_gmm_prior
from dynaboa_tpu.models.hmr import HMR, init_hmr_params
from dynaboa_tpu.parallel import ParallelStreams, make_mesh, stack_frames
from tests.test_engine import make_smpls, IMG, WIDTH


@pytest.fixture(scope="module")
def par_setup():
    # light config: bilevel on, dynamic/extras off -> small program
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
    mesh = make_mesh(4)
    par = ParallelStreams(eng, mesh)
    return par, params


def make_items(rng, n):
    return [{
        "image": rng.normal(size=(IMG, IMG, 3)).astype(np.float32),
        "smpl_j2d": np.concatenate(
            [rng.uniform(-1, 1, (49, 2)), np.ones((49, 1))], -1
        ).astype(np.float32),
        "pose": rng.normal(scale=0.2, size=72).astype(np.float32),
        "betas": rng.normal(scale=0.3, size=10).astype(np.float32),
        "gender": np.int32(0),
    } for _ in range(n)]


class TestParallelStreams:
    def test_eight_streams_on_four_devices(self, par_setup, rng):
        par, params = par_setup
        S = 8  # 2 streams per device (vmap within shard)
        states = par.init_states(params, S, img_res=IMG)
        frames = stack_frames(make_items(rng, S))
        new_states, out = par.step(states, frames)
        jax.block_until_ready(new_states.params)

        assert np.asarray(new_states.step).shape == (S,)
        assert (np.asarray(new_states.step) == 1).all()
        assert out["mpjpe"].shape == (S, 1)
        assert np.isfinite(np.asarray(out["mpjpe"])).all()

        # different frames -> different per-stream adapted params
        leaf = jax.tree.leaves(new_states.params)[0]
        assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))

    def test_streams_independent_of_mesh_layout(self, par_setup, rng):
        """Stream 0 must compute the same result regardless of which other
        streams run beside it (no hidden cross-stream coupling)."""
        par, params = par_setup
        items = make_items(rng, 8)
        s8 = par.init_states(params, 8, img_res=IMG)
        out8 = par.step(s8, stack_frames(items))[1]

        items2 = items[:4] + make_items(rng, 4)  # perturb the tail streams
        s8b = par.init_states(params, 8, img_res=IMG)
        out8b = par.step(s8b, stack_frames(items2))[1]
        np.testing.assert_allclose(np.asarray(out8["mpjpe"][:4]),
                                   np.asarray(out8b["mpjpe"][:4]), atol=1e-5)

    def test_rejects_indivisible_stream_count(self, par_setup):
        par, params = par_setup
        with pytest.raises(ValueError):
            par.init_states(params, 6, img_res=IMG)
