import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
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

    def test_periodic_async_checkpoint_resume(self, engine, tmp_path):
        """checkpoint_every uses AsyncCheckpointer: the write happens in a
        worker thread, but run() must not return before the file is complete,
        and a fresh runner must resume from it bit-exactly."""
        eng, params = engine
        stream = SyntheticStream(num_frames=6, img_res=IMG, seed=3)

        r1 = StreamRunner(eng, str(tmp_path / "a"), log_every=100)
        s_full, _ = r1.run(stream, eng.init_state(params, img_res=IMG))

        r2 = StreamRunner(eng, str(tmp_path / "b"), checkpoint_every=2,
                          log_every=100)
        r2.run(stream, eng.init_state(params, img_res=IMG), max_frames=4)
        ckpt = str(tmp_path / "b" / "checkpoint.npz")
        assert osp.exists(ckpt)
        assert not osp.exists(ckpt + ".tmp")   # atomic rename completed

        r3 = StreamRunner(eng, str(tmp_path / "c"), log_every=100)
        s_resumed, _ = r3.run(stream, eng.init_state(params, img_res=IMG),
                              resume_from=ckpt)
        assert int(s_resumed.step) == int(s_full.step) == 6
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

    def test_state_roundtrip_multislice(self, engine, tmp_path, monkeypatch):
        """The streamed writer fetches flat buffers in _SLICE_ELEMS windows
        (clamped dynamic_slice, tail trimmed on host).  Tiny test states fit
        one window, so shrink the window to force the multi-slice path —
        including a non-divisible tail — and require bit-exactness."""
        from dynaboa_tpu.engine import checkpoint as ck

        eng, params = engine
        state = eng.init_state(params, img_res=IMG)
        # RANDOMIZE every array leaf: a fresh init_state zeroes the Adam
        # moments and history ring that land in the packed tail, which let
        # a ragged-final-window corruption (writing the clamped window's
        # head instead of its tail) round-trip zeros for zeros and pass
        rng = np.random.default_rng(11)
        state = jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(np.shape(a)), a.dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, state)
        n_f32 = sum(int(np.prod(np.shape(x)))
                    for x in jax.tree.leaves(state)
                    if hasattr(x, "dtype") and x.dtype == np.float32)
        slice_elems = n_f32 // 3 - 7          # ≥3 windows, ragged tail
        assert slice_elems > 0
        monkeypatch.setattr(ck, "_SLICE_ELEMS", slice_elems)
        p = str(tmp_path / "ck_ms.npz")
        ck.save_state(p, state)
        restored = ck.load_state(p, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_async_checkpoint_failure_surfaces_and_worker_survives(
            self, engine, tmp_path):
        """A failed checkpoint write (ENOSPC, permissions, a dropped tunnel
        hardening a slice fetch) must NOT kill the worker thread silently:
        the next wait() raises, and a subsequent submit to a good path still
        completes (the worker stays alive — a dead worker would make wait()
        hang forever)."""
        import pytest

        from dynaboa_tpu.engine.checkpoint import AsyncCheckpointer, load_state

        eng, params = engine
        state = eng.init_state(params, img_res=IMG)
        ck = AsyncCheckpointer()
        # a FILE where the parent dir must go makes the write fail
        # (the writer makedirs missing parents, so a merely-absent dir
        # would succeed)
        (tmp_path / "blocker").write_text("")
        ck.submit(str(tmp_path / "blocker" / "ck.npz"), state)
        with pytest.raises(RuntimeError, match="checkpoint write failed"):
            ck.wait()
        good = str(tmp_path / "ck_ok.npz")
        ck.submit(good, state)     # must not deadlock on a dead worker
        ck.wait()
        restored = load_state(good, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonblocking_submit_skips_while_busy(self, engine, tmp_path,
                                                 monkeypatch):
        """submit(block=False) must refuse (return False) while the previous
        write is in flight instead of stalling the caller — a blocking
        submit couples the dispatch loop to checkpoint throughput when the
        writer is slower than the cadence (the r4 soak's 22 -> 9.9 fps
        collapse)."""
        import threading
        import time as _time

        from dynaboa_tpu.engine import checkpoint as ckmod

        eng, params = engine
        state = eng.init_state(params, img_res=IMG)
        release = threading.Event()
        real_write = ckmod._write_packed

        def slow_write(path, manifest, packed):
            release.wait(timeout=30)
            real_write(path, manifest, packed)

        monkeypatch.setattr(ckmod, "_write_packed", slow_write)
        # duty=1.0: no post-write cooldown, so this test isolates the
        # busy -> skip behavior (the cooldown is exercised below)
        ck = ckmod.AsyncCheckpointer(duty=1.0)
        p = str(tmp_path / "ck.npz")
        assert ck.submit(p, state, block=False) is True
        t0 = _time.perf_counter()
        assert ck.submit(p, state, block=False) is False  # busy -> skip
        assert _time.perf_counter() - t0 < 5.0            # and didn't stall
        # the refusal names its cause so the runner's skip log doesn't
        # blame a slow writer for a duty-cycle skip (or vice versa)
        assert ck.last_refusal == "busy"
        release.set()
        ck.wait()
        assert ck.submit(p, state, block=False) is True   # idle again
        ck.wait()
        ck.close()

    def test_duty_cycle_cooldown(self, engine, tmp_path, monkeypatch):
        """After a write the checkpointer refuses non-blocking submits for
        duration * (1 - duty) / duty — checkpoint traffic must not saturate
        the transport the dispatches ride (measured 5x dispatch drag from
        back-to-back 434 MB writes, SOAK r5)."""
        import time as _time

        from dynaboa_tpu.engine import checkpoint as ckmod

        eng, params = engine
        state = eng.init_state(params, img_res=IMG)
        real_write = ckmod._write_packed

        def timed_write(path, manifest, packed):
            _time.sleep(0.5)
            real_write(path, manifest, packed)

        monkeypatch.setattr(ckmod, "_write_packed", timed_write)
        ck = ckmod.AsyncCheckpointer(duty=0.25)   # cooldown = 3x duration
        p = str(tmp_path / "ck.npz")
        assert ck.submit(p, state, block=False) is True
        ck.wait()                                  # write done (>= 0.5 s)
        assert ck.submit(p, state, block=False) is False   # cooling down
        assert ck.last_refusal == "cooldown"               # idle, not busy
        assert ck.submit(p, state, block=True) is True     # blocking ignores
        ck.wait()
        # after the cooldown elapses, non-blocking submits pass again
        deadline = _time.perf_counter() + 15.0
        while _time.perf_counter() < deadline:
            if ck.submit(p, state, block=False):
                break
            _time.sleep(0.2)
        else:
            raise AssertionError("cooldown never elapsed")
        ck.wait()
        ck.close()

    def test_runner_skips_checkpoints_but_final_state_is_on_disk(
            self, engine, tmp_path, monkeypatch):
        """When the writer lags the cadence the runner SKIPS intervals
        (counted in the summary) — but the run-end blocking checkpoint must
        still leave the FINAL state on disk, so resume semantics never
        depend on which intervals actually wrote."""
        import time as _time

        from dynaboa_tpu.engine import checkpoint as ckmod
        from dynaboa_tpu.engine.checkpoint import load_state

        eng, params = engine
        stream = SyntheticStream(num_frames=6, img_res=IMG, seed=3)
        real_write = ckmod._write_packed

        def slow_write(path, manifest, packed):
            # slower than the per-frame cadence (steady steps are ~0.1 s on
            # the warm CPU engine), so later intervals find the worker busy
            _time.sleep(1.5)
            real_write(path, manifest, packed)

        monkeypatch.setattr(ckmod, "_write_packed", slow_write)
        exp = tmp_path / "x"
        r = StreamRunner(eng, str(exp), checkpoint_every=1, log_every=100)
        state, summary = r.run(stream, eng.init_state(params, img_res=IMG))
        assert summary["checkpoint_skipped"] >= 1
        restored = load_state(str(exp / "checkpoint.npz"),
                              eng.init_state(params, img_res=IMG))
        assert int(restored.step) == 6     # the FINAL state, not a stale one
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stale_write_error_does_not_abandon_final_checkpoint(
            self, engine, tmp_path, monkeypatch):
        """A pending failure from an EARLIER periodic write surfaces inside
        the run-end blocking submit (its wait() raises before the final
        state is queued).  That stale, already-cleared error must not
        abandon the guaranteed final checkpoint — the runner retries once
        and the FINAL state lands on disk."""
        from dynaboa_tpu.engine import checkpoint as ckmod
        from dynaboa_tpu.engine.checkpoint import load_state

        eng, params = engine
        # Frame 2's periodic write FAILS, and a near-zero duty makes the
        # post-write cooldown effectively infinite so no later periodic
        # submit passes the gate to surface (and clear) the error — the
        # exact scenario from the review: a stale failure still pending
        # when the run-end blocking submit's wait() runs.
        stream = SyntheticStream(num_frames=5, img_res=IMG, seed=3)
        real_write = ckmod._write_packed
        calls = []

        def flaky_write(path, manifest, packed):
            calls.append(path)
            if len(calls) == 1:           # the only periodic write fails
                raise OSError("injected tunnel drop")
            real_write(path, manifest, packed)

        monkeypatch.setattr(ckmod, "_write_packed", flaky_write)
        exp = tmp_path / "x"
        r = StreamRunner(eng, str(exp), checkpoint_every=2, log_every=100,
                         checkpoint_duty=1e-6)
        state, summary = r.run(stream, eng.init_state(params, img_res=IMG))
        assert summary["checkpoint_failures"] >= 1
        restored = load_state(str(exp / "checkpoint.npz"),
                              eng.init_state(params, img_res=IMG))
        assert int(restored.step) == 5    # final state, despite the failure
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_final_checkpoint_skipped_when_periodic_covered_it(
            self, engine, tmp_path, monkeypatch):
        """When the last periodic write already captured the final state
        and completed cleanly, run end must NOT pay a redundant full
        rewrite (434 MB / 14-25 s at full scale) for a byte-identical
        resume point."""
        from dynaboa_tpu.engine import checkpoint as ckmod
        from dynaboa_tpu.engine.checkpoint import load_state

        eng, params = engine
        # 4 frames / every=2: periodic writes at frames 2 and 4 — frame 4
        # IS the final state, so exactly 2 writes total, not 3
        stream = SyntheticStream(num_frames=4, img_res=IMG, seed=3)
        real_write = ckmod._write_packed
        calls = []

        def counting_write(path, manifest, packed):
            calls.append(path)
            real_write(path, manifest, packed)

        monkeypatch.setattr(ckmod, "_write_packed", counting_write)
        exp = tmp_path / "x"
        # duty=1.0: no cooldown, so both periodic intervals actually write
        r = StreamRunner(eng, str(exp), checkpoint_every=2, log_every=100,
                         checkpoint_duty=1.0)
        state, summary = r.run(stream, eng.init_state(params, img_res=IMG))
        assert len(calls) == 2, f"expected 2 writes, saw {len(calls)}"
        restored = load_state(str(exp / "checkpoint.npz"),
                              eng.init_state(params, img_res=IMG))
        assert int(restored.step) == 4

    def test_checkpoint_failure_does_not_abort_run(self, engine, tmp_path):
        """Checkpoint writes are the backup path: when every write fails,
        the run must still complete, produce its artifacts, and count the
        failures in the summary — not raise out of the dispatch loop."""
        eng, params = engine
        stream = SyntheticStream(num_frames=6, img_res=IMG, seed=3)
        exp = tmp_path / "x"
        exp.mkdir()
        # a directory where the writer's tmp file goes makes every write fail
        (exp / "checkpoint.npz.tmp").mkdir()
        r = StreamRunner(eng, str(exp), checkpoint_every=2, log_every=100)
        state, summary = r.run(stream, eng.init_state(params, img_res=IMG))
        assert summary["frames"] == 6
        assert summary["checkpoint_failures"] >= 1
        assert np.isfinite(summary["mpjpe"])
        assert osp.exists(str(exp / "res.npz"))   # finalize artifacts intact

    def test_fused_preprocess_stream_mode(self):
        """--fused_preprocess parity: a raw-frame item cropped on device must
        match the host crop path (reference utils/dataprocess.py:48-96) on
        the same frame, and the engine must accept the result end-to-end."""
        from dynaboa_tpu import constants
        from dynaboa_tpu.ops import image as I

        stream = SyntheticStream(num_frames=2, img_res=IMG, seed=7,
                                 fused_preprocess=True)
        item = next(iter(stream))
        assert "raw_image" in item and "image" not in item
        f = frame_from_item(item)
        # the fused path honors the stream's crop resolution
        assert f.image.shape == (1, IMG, IMG, 3)

        host = I.crop_numpy(item["raw_image"].astype(np.float32),
                            item["center"], float(item["scale"]),
                            [IMG, IMG]).astype(np.float32) / 255.0
        host = (host - constants.IMG_NORM_MEAN) / constants.IMG_NORM_STD
        dev = np.asarray(f.image[0])
        assert np.abs(dev - host).mean() < 5e-2
        assert np.isfinite(dev).all()

    def test_save_overlays_and_cam_translation_dump(self, engine, tmp_path):
        """--save_res parity: Pred npz carries the translation-converted cam
        (dynaboa_internet.py:157-159) and the rasterizer writes overlay pngs
        + obj meshes (base_adaptor.py:429-443)."""
        import cv2

        eng, params = engine
        stream = SyntheticStream(num_frames=2, img_res=IMG, seed=5)
        # drop a fake "original frame" where imgname points
        imgdir = tmp_path / "imgs"
        imgdir.mkdir()
        items = list(iter(stream))
        for it in items:
            cv2.imwrite(str(imgdir / it["imgname"]),
                        np.random.default_rng(0).integers(
                            0, 255, (64, 64, 3)).astype(np.uint8))
        faces = np.asarray(
            [[0, 1, 2], [2, 3, 4]], np.int32)  # tiny dummy topology
        runner = StreamRunner(eng, str(tmp_path / "exp"),
                              save_predictions=True, save_overlays=True,
                              img_root=str(imgdir), faces=faces,
                              log_every=100)
        state = eng.init_state(params, img_res=IMG)
        runner.run(stream, state)

        pred = np.load(str(tmp_path / "exp" / "result" / "Pred_0.npz"))
        cam_crop = pred["cam_crop"]
        want_t = np.stack([
            cam_crop[:, 1], cam_crop[:, 2],
            2.0 * 5000.0 / (224.0 * cam_crop[:, 0] + 1e-9)], axis=-1)
        np.testing.assert_allclose(pred["cam"], want_t, rtol=1e-6)
        assert osp.exists(str(tmp_path / "exp" / "image" / "Pred_0.png"))
        assert osp.exists(str(tmp_path / "exp" / "mesh" / "Pred_0.obj"))

    @pytest.mark.slow
    def test_batched_window_adaptation(self, engine, tmp_path):
        """window_size=W: W frames share one bilevel update; per-frame
        metrics still come out for every frame (SURVEY §2d variant)."""
        eng, params = engine
        stream = SyntheticStream(num_frames=6, img_res=IMG, seed=9)
        runner = StreamRunner(eng, str(tmp_path), log_every=100)
        state = eng.init_state(params, batch_size=2, img_res=IMG)
        state, summary = runner.run(stream, state, window_size=2)

        assert summary["frames"] == 6          # all frames recorded
        assert int(state.step) == 3            # but only 3 engine updates
        assert len(runner.optim_step_record) == 6
        # per-frame metrics are real per-frame values, not window copies
        assert len(set(np.round(runner.mpjpe_all, 6))) > 1

    @pytest.mark.slow
    def test_window_composes_with_chunked_scan(self, engine, tmp_path):
        """chunk_size scans over WINDOWS: 8 frames = 4 windows of 2 = 2 scan
        dispatches of 2 windows each."""
        eng, params = engine
        stream = SyntheticStream(num_frames=8, img_res=IMG, seed=11)
        runner = StreamRunner(eng, str(tmp_path), log_every=100)
        state = eng.init_state(params, batch_size=2, img_res=IMG)
        state, summary = runner.run(stream, state, window_size=2,
                                    chunk_size=2)
        assert summary["frames"] == 8
        assert int(state.step) == 4

    def test_window_composes_with_fused_preprocess(self, engine, tmp_path):
        eng, params = engine
        stream = SyntheticStream(num_frames=4, img_res=IMG, seed=12,
                                 fused_preprocess=True)
        runner = StreamRunner(eng, str(tmp_path), log_every=100)
        state = eng.init_state(params, batch_size=2, img_res=IMG)
        state, summary = runner.run(stream, state, window_size=2)
        assert summary["frames"] == 4
        assert int(state.step) == 2
        assert np.isfinite(summary["mpjpe"])

    def test_window_pads_partial_tail(self, engine, tmp_path):
        """The final partial window is padded + masked, not dropped: all 5
        frames are evaluated (3 windows: 2+2+1-real), and the pad row never
        produces a record (see TestWindowTailPadding for the loss math)."""
        eng, params = engine
        stream = SyntheticStream(num_frames=5, img_res=IMG, seed=9)
        runner = StreamRunner(eng, str(tmp_path), log_every=100)
        state = eng.init_state(params, batch_size=2, img_res=IMG)
        state, summary = runner.run(stream, state, window_size=2)
        assert summary["frames"] == 5
        assert len(runner.mpjpe_all) == 5
        assert int(state.step) == 3            # 3 window updates

    @pytest.mark.slow
    def test_per_step_trajectory_records(self, tmp_path):
        """The reference records sims + metrics after EVERY dynamic update
        (dynaboa_benchmark.py:158-191); the runner's artifacts must carry the
        per-update trajectories, with lengths equal to each frame's recorded
        update count."""
        cfg = AdaptConfig(dynamic_boa=True, optim_steps=2,
                          use_meanteacher=False, use_motion=False,
                          retrieval=False, lower_level_mixtrain=False,
                          upper_level_mixtrain=False,
                          record_lowerlevel=False)
        model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
        params = init_hmr_params(model, jax.random.PRNGKey(0),
                                 input_shape=(1, IMG, IMG, 3))
        eng = BilevelEngine(cfg, model, synthetic_gmm_prior(seed=4),
                            make_smpls(), None)
        stream = SyntheticStream(num_frames=3, img_res=IMG, seed=7)
        runner = StreamRunner(eng, str(tmp_path), log_every=100)
        state, _ = runner.run(stream, eng.init_state(params, img_res=IMG))

        counts = np.asarray(runner.optim_step_record) + 1
        fs = np.load(osp.join(tmp_path, "feat_sims.npz"))
        np.testing.assert_array_equal(fs["per_step_counts"], counts)
        st = np.load(osp.join(tmp_path, "steps_statistic_res.npz"))
        for key in ("mpjpe", "pampjpe", "pve", "upper_loss"):
            assert st[key].shape == (3, counts.max()), key
            np.testing.assert_array_equal(st[f"{key}_counts"], counts)
            for r in range(3):
                row = st[key][r]
                assert np.isfinite(row[: counts[r]]).all()
                assert np.isnan(row[counts[r]:]).all()
        # trajectory endpoints must agree with the per-frame aggregates
        for r in range(3):
            np.testing.assert_allclose(
                st["mpjpe"][r, counts[r] - 1], runner.mpjpe_all[r],
                rtol=1e-5)

    def test_auto_reset_on_divergence(self, tmp_path):
        """auto_reset: non-finite losses/metrics trigger an automatic
        model/teacher/optimizer reset (the reference offers this only as the
        webcam path's interactive 'r' key)."""
        from dynaboa_tpu.losses import synthetic_gmm_prior
        from dynaboa_tpu.engine import synthetic_store
        from dynaboa_tpu.models.hmr import HMR, init_hmr_params
        from tests.test_engine import make_smpls

        # an absurd outer lr makes the weights explode within a frame or two
        cfg = AdaptConfig(lr=1e12, dynamic_boa=False, use_meanteacher=False,
                          use_motion=False, retrieval=False,
                          lower_level_mixtrain=False,
                          upper_level_mixtrain=False,
                          record_lowerlevel=False)
        model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
        params = init_hmr_params(model, jax.random.PRNGKey(0),
                                 input_shape=(1, IMG, IMG, 3))
        eng = BilevelEngine(cfg, model, synthetic_gmm_prior(seed=4),
                            make_smpls(),
                            synthetic_store(seed=6, img_res=IMG,
                                            feat_dim=8 * WIDTH * 4))
        stream = SyntheticStream(num_frames=6, img_res=IMG, seed=2)
        runner = StreamRunner(eng, str(tmp_path), log_every=100,
                              defer_window=2)
        state = eng.init_state(params, img_res=IMG)
        state, summary = runner.run(stream, state, auto_reset=True)
        assert runner.reset_count >= 1
        assert summary["frames"] == 6    # the run completes regardless

    def test_materialize_outputs_roundtrip(self):
        """The packed two-fetch materialization must reproduce every leaf of
        every frame's output tree (mixed float/int dtypes, nested dicts)."""
        import jax.numpy as jnp

        from dynaboa_tpu.engine.runner import materialize_outputs

        rng = np.random.default_rng(3)
        outs = []
        for t in range(5):
            outs.append({
                "mpjpe": jnp.asarray(rng.normal(size=(1,)), jnp.float32),
                "optim_steps": jnp.asarray(t, jnp.int32),
                "verts": jnp.asarray(
                    rng.normal(size=(1, 7, 3)), jnp.float32),
                "upper": {"loss": jnp.asarray(rng.normal(), jnp.float32),
                          "s2dloss": jnp.asarray(rng.normal(), jnp.float32)},
            })
        mats = materialize_outputs(outs)
        assert len(mats) == 5
        for got, want in zip(mats, outs):
            for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-6)
            assert got["optim_steps"].dtype.kind == "i"

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
        init_snapshot = [np.asarray(a) for a in
                         jax.tree.leaves(runner_state.params)]
        stream = SyntheticStream(num_frames=1, img_res=IMG, seed=4)
        item = next(iter(stream))
        new_state, _ = eng.step(runner_state, frame_from_item(item))
        reset = eng.init_state(params, img_res=IMG)
        for a, b in zip(jax.tree.leaves(reset.params), init_snapshot):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(reset.step) == 0


@pytest.mark.slow
class TestWindowTailPadding:
    """Streams whose length is not a multiple of window_size: the final
    partial window is padded + masked, never dropped — every frame is
    evaluated (the reference evaluates every frame)."""

    def test_all_frames_seen_for_every_window_size(self, tmp_path):
        import jax

        from dynaboa_tpu.config import AdaptConfig
        from dynaboa_tpu.data import SyntheticStream
        from dynaboa_tpu.engine import BilevelEngine, synthetic_store
        from dynaboa_tpu.engine.runner import StreamRunner
        from dynaboa_tpu.losses import synthetic_gmm_prior
        from dynaboa_tpu.models.hmr import HMR, init_hmr_params
        from tests.test_engine import make_smpls, IMG, WIDTH

        cfg = AdaptConfig(dynamic_boa=False, use_meanteacher=False,
                          use_motion=False, retrieval=False,
                          lower_level_mixtrain=False,
                          upper_level_mixtrain=False,
                          record_lowerlevel=False)
        model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
        params = init_hmr_params(model, jax.random.PRNGKey(0),
                                 input_shape=(1, IMG, IMG, 3))
        eng = BilevelEngine(cfg, model, synthetic_gmm_prior(seed=4),
                            make_smpls(),
                            synthetic_store(seed=6, img_res=IMG,
                                            feat_dim=8 * WIDTH * 4))
        N, W = 7, 3   # 2 full windows + a 1-frame tail
        stream = SyntheticStream(num_frames=N, seed=2, img_res=IMG)
        runner = StreamRunner(eng, str(tmp_path), log_every=10_000)
        state = eng.init_state(params, batch_size=W, img_res=IMG)
        _, summary = runner.run(stream, state, window_size=W)
        assert runner.frames_seen == N
        assert summary["frames"] == N
        assert len(runner.mpjpe_all) == N
        assert np.isfinite(summary["mpjpe"])

    def test_masked_pad_rows_do_not_change_the_update(self):
        """A padded+masked window must produce the same loss value and the
        same parameter update as the unpadded batch of real rows —
        row_weighted_mean excludes pad rows from numerator AND
        denominator."""
        import jax
        import jax.numpy as jnp

        from dynaboa_tpu.losses.adaptation import row_weighted_mean

        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5, 2)),
                        jnp.float32)
        pad = jnp.concatenate([x, x[-1:], x[-1:]])        # 2 pad rows
        w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(row_weighted_mean(pad, w)),
                                   np.asarray(x.mean()), rtol=1e-6)
        # all-ones weights reproduce the plain mean to 1 ULP (mean lowers
        # to a reciprocal multiply; the weighted form divides)
        np.testing.assert_allclose(
            np.asarray(row_weighted_mean(x, jnp.ones(3))),
            np.asarray(x.mean()), rtol=1e-6)
