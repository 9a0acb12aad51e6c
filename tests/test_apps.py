import os
import os.path as osp

import numpy as np
import pytest

# lean flags: smallest compile that still runs the full app path end-to-end
LEAN = ["--tiny", "1", "--dynamic_boa", "0", "--use_meanteacher", "0",
        "--use_motion", "0", "--retrieval", "0", "--lower_level_mixtrain", "0",
        "--upper_level_mixtrain", "0", "--record_lowerlevel", "0"]


class TestBenchmarkApp:
    def test_synthetic_end_to_end(self, tmp_path):
        from dynaboa_tpu.apps.benchmark import main

        summary = main([
            "--expdir", str(tmp_path), "--expname", "smoke",
            "--synthetic", "3", *LEAN,
        ])
        assert summary["frames"] == 3
        assert np.isfinite(summary["mpjpe"])
        exp = tmp_path / "smoke"
        assert (exp / "res.txt").exists()
        assert (exp / "setting.txt").exists()
        assert (exp / "scalars.jsonl").exists()

    @pytest.mark.slow
    def test_parallel_streams_mode(self, tmp_path):
        """--parallel_streams N: the scale-out product path — N private
        adaptation streams dispatched across the device mesh."""
        from dynaboa_tpu.apps.benchmark import main

        summary = main([
            "--expdir", str(tmp_path), "--expname", "par",
            "--synthetic", "6", "--parallel_streams", "2", *LEAN,
        ])
        assert summary["frames"] == 6
        assert len(summary["per_stream"]) == 2
        assert sum(p["frames"] for p in summary["per_stream"]) == 6
        assert np.isfinite(summary["mpjpe"])
        assert (tmp_path / "par" / "res.txt").exists()


class TestInternetApp:
    def test_synthetic_end_to_end(self, tmp_path):
        """The unlabeled-stream entry point (reference dynaboa_internet.py):
        no metrics, per-frame prediction dumps with the cam translation
        conversion (dynaboa_internet.py:157-159), and the
        run_on_internet.sh shape_prior_weight=2e-4 preset."""
        from dynaboa_tpu.apps.internet import main
        from dynaboa_tpu import constants

        summary = main([
            "--expdir", str(tmp_path), "--expname", "net_smoke",
            "--synthetic", "3", *LEAN,
        ])
        assert summary["frames"] == 3
        # unlabeled stream: no metrics computed (placeholder zeros)
        assert summary.get("mpjpe", 0.0) == 0.0
        exp = tmp_path / "net_smoke"
        assert (exp / "setting.txt").exists()
        assert "2e-04" in (exp / "setting.txt").read_text() \
            or "0.0002" in (exp / "setting.txt").read_text()

        preds = sorted((exp / "result").glob("Pred_*.npz"))
        assert len(preds) == 3
        d = np.load(preds[0])
        assert {"verts", "cam", "rotmat", "beta"} <= set(d.keys())
        # cam is the translation-converted camera: z = 2f/(res*s + eps)
        s = d["cam_crop"][0][0]
        want_z = 2.0 * constants.FOCAL_LENGTH / (constants.IMG_RES * s + 1e-9)
        np.testing.assert_allclose(d["cam"][0][2], want_z, rtol=1e-5)


class TestStreamApp:
    @pytest.mark.slow
    def test_video_end_to_end(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from dynaboa_tpu.apps.stream import main

        # build a tiny test video + precomputed keypoints
        vid = str(tmp_path / "in.mp4")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (320, 240))
        rng = np.random.default_rng(0)
        n = 3
        for _ in range(n):
            w.write(rng.integers(0, 255, size=(240, 320, 3),
                                 dtype=np.uint8))
        w.release()

        kps = np.zeros((n, 25, 3), np.float32)
        kps[:, :, 0] = rng.uniform(100, 220, size=(n, 25))
        kps[:, :, 1] = rng.uniform(60, 180, size=(n, 25))
        kps[:, :, 2] = 0.9
        kp_file = str(tmp_path / "kps.npz")
        np.savez(kp_file, keypoints=kps)

        out_video = str(tmp_path / "out.mp4")
        frames = main([
            "--expdir", str(tmp_path), "--expname", "stream_smoke",
            "--capture_mode", "video", "--video_file", vid,
            "--kp_file", kp_file, "--out_video", out_video, *LEAN,
        ])
        assert frames == n
        assert osp.exists(out_video) and os.path.getsize(out_video) > 0

    @pytest.mark.slow
    def test_video_end_to_end_test_basemodel(self, tmp_path):
        """--test_basemodel renders the FROZEN base model's mesh beside the
        adapted one (reference dynaboa_webcam.py:330-336,414-417): the
        output video must be double width, including pass-through frames."""
        cv2 = pytest.importorskip("cv2")
        from dynaboa_tpu.apps.stream import main

        vid = str(tmp_path / "in.mp4")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (320, 240))
        rng = np.random.default_rng(5)
        n = 3
        for _ in range(n):
            w.write(rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8))
        w.release()
        kps = np.zeros((n, 25, 3), np.float32)
        kps[:, :, 0] = rng.uniform(100, 220, size=(n, 25))
        kps[:, :, 1] = rng.uniform(60, 180, size=(n, 25))
        kps[:, :, 2] = 0.9
        kps[1] = 0.0          # frame 1: no person -> padded pass-through
        kp_file = str(tmp_path / "kps.npz")
        np.savez(kp_file, keypoints=kps)

        out_video = str(tmp_path / "out.mp4")
        frames = main([
            "--expdir", str(tmp_path), "--expname", "stream_base",
            "--capture_mode", "video", "--video_file", vid,
            "--kp_file", kp_file, "--out_video", out_video,
            "--test_basemodel", "1", *LEAN,
        ])
        assert frames == n
        cap = cv2.VideoCapture(out_video)
        assert cap.isOpened()
        assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 640   # 2 x 320
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
        cap.release()

    @pytest.mark.slow
    def test_video_end_to_end_fused_preprocess(self, tmp_path):
        """Same stream surface with the on-device crop/resize/normalize
        (--fused_preprocess) instead of the host crop."""
        cv2 = pytest.importorskip("cv2")
        from dynaboa_tpu.apps.stream import main

        vid = str(tmp_path / "in.mp4")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                            (320, 240))
        rng = np.random.default_rng(3)
        n = 3
        for _ in range(n):
            w.write(rng.integers(0, 255, size=(240, 320, 3), dtype=np.uint8))
        w.release()
        kps = np.zeros((n, 25, 3), np.float32)
        kps[:, :, 0] = rng.uniform(100, 220, size=(n, 25))
        kps[:, :, 1] = rng.uniform(60, 180, size=(n, 25))
        kps[:, :, 2] = 0.9
        kp_file = str(tmp_path / "kps.npz")
        np.savez(kp_file, keypoints=kps)

        out_video = str(tmp_path / "out.mp4")
        frames = main([
            "--expdir", str(tmp_path), "--expname", "stream_fused",
            "--capture_mode", "video", "--video_file", vid,
            "--kp_file", kp_file, "--out_video", out_video,
            "--fused_preprocess", "1", *LEAN,
        ])
        assert frames == n
        assert osp.exists(out_video) and os.path.getsize(out_video) > 0


class TestAdaptPipeline:
    def test_one_frame_lag_preserves_order(self):
        """The render of frame t must come from a record returned AFTER
        frame t+1's dispatch (double buffering), and pass-through frames
        (no person detected) must ride the same queue so the output order
        is the capture order."""
        from dynaboa_tpu.apps.stream import AdaptPipeline

        dispatched = []

        class FakeEngine:
            def step(self, state, frame):
                dispatched.append(frame)
                return state, {"verts": np.zeros((1, 4, 3)),
                               "cam": np.zeros((1, 3))}

        pipe = AdaptPipeline(FakeEngine(), state="s0")
        assert pipe.submit("f0", {"i": 0}) is None
        r = pipe.submit("f1", {"i": 1})
        assert r[1]["i"] == 0 and dispatched == ["f0", "f1"]
        r = pipe.submit_passthrough({"i": 2})
        assert r[1]["i"] == 1
        r = pipe.submit("f3", {"i": 3})
        assert r[0] is None and r[1]["i"] == 2
        tail = pipe.drain()
        assert tail[1]["i"] == 3
        assert pipe.drain() is None
        assert dispatched == ["f0", "f1", "f3"]

    def test_reset_preserves_history_ring(self):
        """'r' reset parity with reference reload() (dynaboa_webcam.py:
        184-195): weights/teacher/optimizer return to pristine, the motion
        history ring and frame counter survive."""
        import jax
        from dynaboa_tpu.apps.stream import AdaptPipeline
        from dynaboa_tpu.config import AdaptConfig
        from dynaboa_tpu.engine import BilevelEngine, Frame
        from dynaboa_tpu.losses import synthetic_gmm_prior
        from dynaboa_tpu.models.hmr import HMR, init_hmr_params
        from tests.test_engine import make_smpls, IMG, WIDTH

        cfg = AdaptConfig(dynamic_boa=False, use_meanteacher=False,
                          use_motion=True, retrieval=False,
                          lower_level_mixtrain=False,
                          upper_level_mixtrain=False,
                          record_lowerlevel=False, interval=2,
                          keypoint_source="openpose")
        model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=128)
        params = init_hmr_params(model, jax.random.PRNGKey(0),
                                 input_shape=(1, IMG, IMG, 3))
        eng = BilevelEngine(cfg, model, synthetic_gmm_prior(seed=4),
                            make_smpls(), None, compute_metrics=False)
        pristine = jax.tree.map(np.asarray, params)

        pipe = AdaptPipeline(eng, eng.init_state(params, img_res=IMG))
        rng = np.random.default_rng(0)
        for i in range(2):
            f = Frame(
                image=np.asarray(rng.normal(size=(1, IMG, IMG, 3)),
                                 np.float32),
                j2d=np.concatenate([rng.uniform(-1, 1, (1, 49, 2)),
                                    np.ones((1, 49, 1))], -1).astype(
                                        np.float32),
                pose=np.zeros((1, 72), np.float32),
                betas=np.zeros((1, 10), np.float32),
                gender=np.zeros((1,), np.int32))
            pipe.submit(f, {"i": i})

        hist_before = np.asarray(pipe.state.hist_images)
        step_before = int(pipe.state.step)
        assert np.abs(hist_before).sum() > 0          # ring was written
        # adapted weights have drifted from pristine
        drift = max(np.abs(a - np.asarray(b)).max() for a, b in zip(
            jax.tree.leaves(pristine), jax.tree.leaves(pipe.state.params)))
        assert drift > 0

        pipe.reset(params)
        for a, b in zip(jax.tree.leaves(pristine),
                        jax.tree.leaves(pipe.state.params)):
            np.testing.assert_array_equal(a, np.asarray(b))
        np.testing.assert_array_equal(hist_before,
                                      np.asarray(pipe.state.hist_images))
        assert int(pipe.state.step) == step_before


class TestTransferJournalBound:
    """bound_transfer_journal must compact the tunnel client's transfer
    journal by default and honor the short-run opt-out (bench.py sets it)."""

    def test_sets_compact_by_default(self, monkeypatch):
        import dynaboa_tpu

        monkeypatch.delenv("AXON_JOURNAL_COMPACT", raising=False)
        monkeypatch.delenv("DYNABOA_KEEP_TRANSFER_JOURNAL", raising=False)
        dynaboa_tpu.bound_transfer_journal()
        assert os.environ["AXON_JOURNAL_COMPACT"] == "1"

    def test_opt_out_keeps_journal(self, monkeypatch):
        import dynaboa_tpu

        monkeypatch.delenv("AXON_JOURNAL_COMPACT", raising=False)
        monkeypatch.setenv("DYNABOA_KEEP_TRANSFER_JOURNAL", "1")
        dynaboa_tpu.bound_transfer_journal()
        assert "AXON_JOURNAL_COMPACT" not in os.environ

    def test_respects_explicit_user_value(self, monkeypatch):
        import dynaboa_tpu

        monkeypatch.setenv("AXON_JOURNAL_COMPACT", "0")
        monkeypatch.delenv("DYNABOA_KEEP_TRANSFER_JOURNAL", raising=False)
        dynaboa_tpu.bound_transfer_journal()
        assert os.environ["AXON_JOURNAL_COMPACT"] == "0"


class TestVid2Img:
    """The vid2img-parity extractor (reference vid2img.py:26-28): decode
    every mp4 under a directory into {dir}/images/{name}/%06d.png."""

    def test_cli_extracts_frames(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        from dynaboa_tpu.data.preprocess.video import main

        vid = str(tmp_path / "clip.mp4")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                            (32, 24))
        for i in range(4):
            w.write(np.full((24, 32, 3), 40 + i * 40, np.uint8))
        w.release()

        main(["--video_dir", str(tmp_path)])

        out = tmp_path / "images" / "clip"
        frames = sorted(p.name for p in out.glob("*.png"))
        assert frames == [f"{i:06d}.png" for i in range(1, 5)]
        # codecs are lossy; just pin the monotone brightness ramp
        means = [cv2.imread(str(out / f)).mean() for f in frames]
        assert all(b > a + 20 for a, b in zip(means, means[1:])), means
