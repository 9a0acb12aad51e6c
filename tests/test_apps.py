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


class TestStreamApp:
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
