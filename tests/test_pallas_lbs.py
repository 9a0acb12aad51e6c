import numpy as np
import jax.numpy as jnp
import pytest

from dynaboa_tpu.models import synthetic_smpl_model, lbs
from dynaboa_tpu.kernels import PallasSMPL
from tests.test_rotations import random_rotmats


@pytest.fixture(scope="module")
def model():
    # full-size topology so the padding path (6890 -> 7168) is exercised
    return synthetic_smpl_model(seed=7)


class TestPallasSkinning:
    @pytest.mark.slow
    def test_matches_jnp_lbs(self, model, rng):
        betas = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))
        rotmats = jnp.asarray(random_rotmats(rng, 48).reshape(2, 24, 3, 3))

        want_v, want_j = lbs(model, betas, rotmats)
        psmpl = PallasSMPL(model, interpret=True)
        got_v, got_j = psmpl(betas, rotmats)

        np.testing.assert_allclose(np.asarray(got_j), np.asarray(want_j),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   atol=1e-4)

    def test_identity_pose(self, model):
        betas = jnp.zeros((1, 10))
        rotmats = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        psmpl = PallasSMPL(model, interpret=True)
        verts, _ = psmpl(betas, rotmats)
        np.testing.assert_allclose(
            np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5
        )
