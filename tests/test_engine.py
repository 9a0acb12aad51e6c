import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.engine import BilevelEngine, Frame, synthetic_store
from dynaboa_tpu.losses import synthetic_gmm_prior
from dynaboa_tpu.metrics import GenderedSMPL, evaluate_frame
from dynaboa_tpu.models import synthetic_smpl_model, smpl_forward
from dynaboa_tpu.models.hmr import HMR, init_hmr_params

# Tiny geometry: HMR uses global average pooling so any input size works,
# and `width` scales the backbone; CPU conv gradients dominate test time.
IMG = 32
WIDTH = 16
NV = 256


def make_smpls():
    return GenderedSMPL(
        neutral=synthetic_smpl_model(seed=10, num_vertices=NV),
        male=synthetic_smpl_model(seed=11, num_vertices=NV),
        female=synthetic_smpl_model(seed=12, num_vertices=NV),
        J_regressor_h36m=jnp.asarray(
            np.random.default_rng(5).dirichlet(
                np.ones(NV), size=17).astype(np.float32)),
    )


def make_frame(rng, b=1):
    return Frame(
        image=jnp.asarray(rng.normal(size=(b, IMG, IMG, 3)).astype(np.float32)),
        j2d=jnp.asarray(np.concatenate([
            rng.uniform(-1, 1, size=(b, 49, 2)),
            np.ones((b, 49, 1)),
        ], -1).astype(np.float32)),
        pose=jnp.asarray(rng.normal(scale=0.2, size=(b, 72)).astype(np.float32)),
        betas=jnp.asarray(rng.normal(scale=0.3, size=(b, 10)).astype(np.float32)),
        gender=jnp.zeros((b,), jnp.int32),
    )


@pytest.fixture(scope="module")
def setup():
    model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
    params = init_hmr_params(model, jax.random.PRNGKey(0),
                             input_shape=(1, IMG, IMG, 3))
    smpls = make_smpls()
    prior = synthetic_gmm_prior(seed=4)
    store = synthetic_store(seed=6, img_res=IMG, feat_dim=8 * WIDTH * 4)
    return model, params, smpls, prior, store


def make_engine(setup, **cfg_kw):
    model, params, smpls, prior, store = setup
    cfg = AdaptConfig(**cfg_kw)
    return BilevelEngine(cfg, model, prior, smpls, store), params


@pytest.fixture(scope="module")
def engine_capped(setup):
    # similarity test never converges -> dynamic loop always hits the cap
    return make_engine(setup, cos_sim_threshold=-1.0, optim_steps=2)


@pytest.fixture(scope="module")
def engine_noboa(setup):
    return make_engine(setup, use_boa=False)


class TestMetrics:
    def test_zero_error_for_perfect_prediction(self, setup, rng):
        _, _, smpls, _, _ = setup
        pose = jnp.asarray(rng.normal(scale=0.2, size=(2, 72)).astype(np.float32))
        betas = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))
        gender = jnp.zeros((2,), jnp.int32)
        gt = smpl_forward(smpls.male, betas, pose, pose2rot=True)
        m = evaluate_frame(smpls, gt.vertices, pose, betas, gender)
        np.testing.assert_allclose(np.asarray(m["mpjpe"]), 0.0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(m["pampjpe"]), 0.0, atol=1e-2)
        assert np.all(np.asarray(m["pve"]) > 0)  # pve is vs *neutral* GT mesh

    def test_gender_selection(self, setup):
        _, _, smpls, _, _ = setup
        pose = jnp.zeros((1, 72))
        betas = jnp.zeros((1, 10))
        gt_f = smpl_forward(smpls.female, betas, pose, pose2rot=True)
        m = evaluate_frame(smpls, gt_f.vertices, pose, betas,
                           jnp.ones((1,), jnp.int32))
        np.testing.assert_allclose(np.asarray(m["mpjpe"]), 0.0, atol=1e-2)


class TestBilevelStep:
    def test_step_runs_and_updates(self, engine_capped, rng):
        eng, params = engine_capped
        state = eng.init_state(params, img_res=IMG)
        frame = make_frame(rng)
        # the step donates its input state; snapshot what we compare first
        before = jax.tree.map(np.asarray, state.params)
        new_state, out = eng.step(state, frame)

        d = jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
                         before, new_state.params)
        assert max(jax.tree.leaves(d)) > 0
        assert int(new_state.step) == 1
        assert float(jnp.abs(new_state.hist_images[0]).max()) > 0
        for k in ("mpjpe", "pampjpe", "pve", "verts", "rotmat", "beta", "cam",
                  "optim_steps"):
            assert k in out
        assert np.isfinite(float(out["mpjpe"][0]))
        # dynamic loop hit the cap (reference dynaboa_benchmark.py:171-175)
        assert int(out["optim_steps"]) == 2

    def test_deterministic_under_fixed_seed(self, engine_capped, rng):
        eng, params = engine_capped
        frame = make_frame(rng)
        s1, o1 = eng.step(eng.init_state(params, img_res=IMG), frame)
        s2, o2 = eng.step(eng.init_state(params, img_res=IMG), frame)
        np.testing.assert_array_equal(np.asarray(o1["mpjpe"]),
                                      np.asarray(o2["mpjpe"]))
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multi_frame_stream(self, engine_capped, rng):
        eng, params = engine_capped
        state = eng.init_state(params, img_res=IMG)
        for i in range(3):
            state, out = eng.step(state, make_frame(rng))
        assert int(state.step) == 3

    def test_no_boa_single_level_and_teacher_ema(self, engine_noboa, rng):
        eng, params = engine_noboa
        state = eng.init_state(params, img_res=IMG)
        teacher_before = [np.asarray(t) for t in
                          jax.tree.leaves(state.teacher_params)]
        new_state, out = eng.step(state, make_frame(rng))
        assert "lower" in out and "upper" not in out
        assert int(new_state.step) == 1
        # teacher = 0.1 * teacher_old + 0.9 * params_new (single update here)
        for tn, to, pn in zip(jax.tree.leaves(new_state.teacher_params),
                              teacher_before,
                              jax.tree.leaves(new_state.params)):
            want = 0.1 * np.asarray(to) + 0.9 * np.asarray(pn)
            np.testing.assert_allclose(np.asarray(tn), want, atol=1e-6)

    def test_lower_level_reduces_its_loss(self, setup, rng):
        """One inner step at fastlr must reduce the lower-level loss
        (integration seam from SURVEY §4)."""
        model, params, smpls, prior, store = setup
        cfg = AdaptConfig(fastlr=1e-4, use_meanteacher=False,
                          use_motion=False, lower_level_mixtrain=False,
                          upper_level_mixtrain=False, retrieval=False,
                          dynamic_boa=False)
        eng = BilevelEngine(cfg, model, prior, smpls, store)
        frame = make_frame(rng)
        state = eng.init_state(params, img_res=IMG)

        @jax.jit
        def lower(p):
            loss, _ = eng._level_loss(p, frame, state, None, "lower")
            return loss

        l0 = float(lower(params))
        g = jax.jit(jax.grad(lower))(params)
        adapted = jax.tree.map(lambda p, gg: p - cfg.fastlr * gg, params, g)
        l1 = float(lower(adapted))
        assert l1 < l0

    def test_motion_loss_activates_after_interval(self, setup, rng):
        eng, params = make_engine(setup, interval=2, dynamic_boa=False,
                                  record_lowerlevel=False)
        state = eng.init_state(params, img_res=IMG)
        outs = []
        for i in range(4):
            state, out = eng.step(state, make_frame(rng))
            outs.append(out)
        # motion activates strictly after `interval` frames
        # (reference base_adaptor.py:257,306)
        assert float(outs[0]["upper"]["motion_loss"]) == 0.0
        assert float(outs[2]["upper"]["motion_loss"]) == 0.0
        assert float(outs[3]["upper"]["motion_loss"]) > 0.0


class TestFirstOrderMAMLSemantics:
    def test_matches_torch_first_order_maml(self):
        """Weight-delta parity with torch first-order MAML + Adam on a toy
        model: inner SGD on a clone with detached grads, outer backward
        through the clone into the base params (SURVEY §7 hard-part check)."""
        import torch

        w0 = np.array([0.7, -0.3], np.float32)
        x = np.array([1.3, 0.4], np.float32)
        y_low, y_up = 2.0, -1.0
        fastlr, lr, b1, b2 = 0.1, 0.01, 0.5, 0.9

        w = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.Adam([w], lr=lr, betas=(b1, b2))
        inner = ((w * torch.tensor(x)).sum() - y_low) ** 2
        gi = torch.autograd.grad(inner, w)[0].detach()
        adapted = w - fastlr * gi
        outer = ((adapted * torch.tensor(x)).sum() - y_up) ** 2
        opt.zero_grad()
        outer.backward()
        opt.step()
        want = w.detach().numpy()

        import optax

        def L(w, y):
            return (jnp.dot(w, jnp.asarray(x)) - y) ** 2

        wj = jnp.asarray(w0)
        gi_j = jax.grad(L)(wj, y_low)
        adapted_j = wj - fastlr * gi_j
        go_j = jax.grad(L)(adapted_j, y_up)
        tx = optax.adam(lr, b1=b1, b2=b2, eps=1e-8, eps_root=0.0)
        st = tx.init(wj)
        up, st = tx.update(go_j, st, wj)
        got = np.asarray(optax.apply_updates(wj, up))

        np.testing.assert_allclose(got, want, atol=1e-6)


class TestChunkedScan:
    def test_scan_matches_stepwise(self, engine_capped, rng):
        """lax.scan over a frame chunk must produce the same adaptation as
        stepping frame by frame.

        Equivalence is structural, not bitwise: the scan body and the
        standalone step compile to different XLA programs, whose fusion
        order perturbs near-zero gradient coordinates by ~1 ulp — and Adam
        (eps=1e-8) turns a sign flip of such a coordinate into a full
        ±lr-sized update of that weight.  Measured: exactly 1 element in
        6.3e5 differs, by ~1.5*lr, constant across frames.  So the test
        asserts (a) identical dynamic-loop step counts (the gate never
        flips here: thr=-1 caps every frame) and (b) params equal within
        the max possible Adam drift, n_updates * lr per coordinate."""
        eng, params = engine_capped
        frames = [make_frame(rng) for _ in range(3)]

        s_loop = eng.init_state(params, img_res=IMG)
        loop_steps = []
        for f in frames:
            s_loop, o = eng.step(s_loop, f)
            loop_steps.append(int(np.asarray(o["optim_steps"])))

        from dynaboa_tpu.engine.bilevel import stack_frame_list

        stacked = stack_frame_list(frames)
        s_scan, outs = eng.run_chunk(eng.init_state(params, img_res=IMG),
                                     stacked)
        assert outs["mpjpe"].shape[0] == 3
        np.testing.assert_array_equal(
            np.asarray(outs["optim_steps"]).ravel(), loop_steps)
        n_updates = 3 * (1 + eng.cfg.optim_steps)   # frames x (1 + extra)
        tol = n_updates * eng.cfg.lr
        n_noisy = 0
        for a, b in zip(jax.tree.leaves(s_loop.params),
                        jax.tree.leaves(s_scan.params)):
            d = np.abs(np.asarray(a) - np.asarray(b))
            np.testing.assert_array_less(d.max(), tol)
            n_noisy += int((d > 1e-6).sum())
        total = sum(a.size for a in jax.tree.leaves(s_scan.params))
        # the Adam sign-flip noise must stay confined to isolated coords
        assert n_noisy <= max(8, total // 10_000), (n_noisy, total)


class TestNoBakedConstants:
    def test_step_hlo_has_no_large_literals(self, engine_capped, rng):
        """The data assets (exemplar bank, SMPL tensors, GMM) must enter the
        step program as ARGUMENTS, not baked constants: embedded literals
        made the HLO ~170 MB and the serialized executable ~450 MB, costing
        minutes per compile-cache load (docs/PERF.md 'Compile times').
        Guard the invariant: no dense literal in the lowered step may exceed
        1 KB of text (the synthetic store bank alone would be ~4 MB)."""
        import re

        import jax.numpy as jnp

        eng, params = engine_capped
        state = eng.init_state(params, img_res=IMG)
        frame = Frame(
            image=jnp.asarray(rng.normal(size=(1, IMG, IMG, 3)),
                              jnp.float32),
            j2d=jnp.concatenate([
                jnp.asarray(rng.uniform(-1, 1, (1, 49, 2)), jnp.float32),
                jnp.ones((1, 49, 1))], -1),
            pose=jnp.zeros((1, 72)),
            betas=jnp.zeros((1, 10)),
            gender=jnp.zeros((1,), jnp.int32))
        low = jax.jit(eng._step_with_assets, donate_argnums=(0,)).lower(
            state, frame, jnp.float32(-1.0), jnp.int32(2), eng._assets)
        txt = low.as_text()
        big = re.findall(r"dense<[^>]{1024,}>", txt)
        assert not big, (
            f"{len(big)} large dense literal(s) baked into the step HLO; "
            f"largest {max(len(b) for b in big)} chars — an asset is being "
            "closed over instead of passed through _extract_assets")


class TestInjectAssetsGuard:
    def test_reentrant_injection_raises(self, engine_capped):
        """`_inject_assets` swaps live engine attributes during a trace; a
        concurrent (or nested) trace of the same engine would silently read
        the wrong arrays.  The guard must turn that into a loud error."""
        eng, _ = engine_capped
        with eng._inject_assets(eng._assets):
            with pytest.raises(RuntimeError, match="re-entrantly"):
                with eng._inject_assets(eng._assets):
                    pass
        # the guard must fully release on exit (including after the raise)
        with eng._inject_assets(eng._assets):
            pass

    def test_concurrent_traces_fail_loudly_not_silently(self, engine_capped,
                                                        rng):
        """Two threads tracing programs of the same engine concurrently:
        either they serialize by luck or one raises — but neither may
        corrupt the other's trace silently.  Exercise the seam with a trace
        function that deliberately yields the GIL inside the context."""
        import threading
        import time as _t

        eng, _ = engine_capped
        errors: list[Exception] = []

        def trace_once(delay, hold):
            try:
                _t.sleep(delay)
                with eng._inject_assets(eng._assets):
                    _t.sleep(hold)
            except RuntimeError as e:
                errors.append(e)

        threads = [threading.Thread(target=trace_once, args=(0.0, 0.3)),
                   threading.Thread(target=trace_once, args=(0.1, 0.0))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # exactly one thread entered; the other raised the guard error
        assert len(errors) == 1 and "re-entrantly" in str(errors[0])
        # engine attributes restored to real (non-tracer) assets
        assert eng.store is eng._assets["store"]


@pytest.mark.slow
class TestWorstCaseExperiments:
    """Flag-gated worst-case-latency experiments (docs/PERF.md): both
    change the extra-update protocol and default OFF; these tests pin
    that they run, converge-gate correctly, and leave the mandatory
    first update untouched."""

    def test_fast_extra_updates_runs_and_matches_first_update(self, setup,
                                                              rng):
        eng_ref, params = make_engine(setup, cos_sim_threshold=-1.0,
                                      optim_steps=2,
                                      record_lowerlevel=False)
        eng_fast, _ = make_engine(setup, cos_sim_threshold=-1.0,
                                  optim_steps=2, record_lowerlevel=False,
                                  fast_extra_updates=True)
        frame = make_frame(rng)
        out_ref = eng_ref.step(eng_ref.init_state(params, img_res=IMG),
                               frame)[1]
        out_fast = eng_fast.step(eng_fast.init_state(params, img_res=IMG),
                                 frame)[1]
        # same number of (forced) updates; the FIRST update's loss is the
        # full 3-row loss in both modes
        assert int(np.asarray(out_fast["optim_steps"])) == 2
        np.testing.assert_allclose(
            np.asarray(out_fast["per_step_loss"])[0],
            np.asarray(out_ref["per_step_loss"])[0], rtol=1e-5)
        # extra updates drop the labeled term -> losses differ
        assert not np.allclose(np.asarray(out_fast["per_step_loss"])[1:],
                               np.asarray(out_ref["per_step_loss"])[1:])
        for k in ("mpjpe", "pampjpe", "pve"):
            assert np.isfinite(np.asarray(out_fast[k])).all()

    def test_half_res_probe_runs_and_caps(self, setup, rng):
        eng, params = make_engine(setup, cos_sim_threshold=-1.0,
                                  optim_steps=2, record_lowerlevel=False,
                                  probe_res_factor=2)
        frame = make_frame(rng)
        state, out = eng.step(eng.init_state(params, img_res=IMG), frame)
        assert int(np.asarray(out["optim_steps"])) == 2
        for k in ("mpjpe", "pampjpe", "pve", "verts"):
            assert np.isfinite(np.asarray(out[k])).all()
        # the final prediction is full-res: verts come from a full-res
        # forward, so feat_sim (init vs final, both full-res) is sane
        sims = np.asarray(out["feat_sim"])
        assert sims.shape == (15,) and np.isfinite(sims).all()
