"""End-to-end tests for the offline preprocessing surfaces that previously
had no direct coverage: the H36M frame extractor (reference
utils/data_preprocess/human36m.py:25-74), the AlphaPose internet extractor
(utils/data_preprocess/internet_data.py:42-79), and the process_data CLI
dispatcher (reference process_data.py:9-16)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dynaboa_tpu.data.preprocess.cdf import write_cdf
from dynaboa_tpu.data.preprocess.human36m import h36m_train_extract
from dynaboa_tpu.data.preprocess.internet import (
    internet_data_extract,
    person_height,
)
from dynaboa_tpu.apps import process_data


def _write_video(path, n_frames, size=(32, 24)):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, size)
    assert w.isOpened()
    for i in range(n_frames):
        w.write(np.full((size[1], size[0], 3), (i * 17) % 255, np.uint8))
    w.release()


def _h36m_tree(root, subject="S9", action="Walking", camera="60457274",
               cdf_frames=12, video_frames=12):
    pose_dir = root / subject / "MyPoseFeatures" / "D3_Positions_mono"
    vid_dir = root / subject / "Videos"
    pose_dir.mkdir(parents=True)
    vid_dir.mkdir(parents=True)
    name = f"{action}.{camera}"
    write_cdf(str(pose_dir / f"{name}.cdf"), "Pose",
              np.zeros((1, cdf_frames, 96)))
    _write_video(vid_dir / f"{name}.mp4", video_frames)
    return name


class TestH36MExtract:
    def test_every_5th_frame_of_keep_camera(self, tmp_path):
        _h36m_tree(tmp_path, cdf_frames=12, video_frames=12)
        # a non-keep camera and an _ALL action must both be skipped
        _h36m_tree(tmp_path / "ignored", cdf_frames=12, video_frames=12)
        pose_dir = (tmp_path / "S9" / "MyPoseFeatures" /
                    "D3_Positions_mono")
        write_cdf(str(pose_dir / "Jumping.55011271.cdf"), "Pose",
                  np.zeros((1, 12, 96)))
        write_cdf(str(pose_dir / "_ALL.60457274.cdf"), "Pose",
                  np.zeros((1, 12, 96)))

        h36m_train_extract(str(tmp_path), training_split=False,
                           extract_img=True)

        got = sorted(os.listdir(tmp_path / "images"))
        # frames 0, 5, 10 -> 1-based names 000001/000006/000011
        assert got == [
            "S9_Walking.60457274_000001.jpg",
            "S9_Walking.60457274_000006.jpg",
            "S9_Walking.60457274_000011.jpg",
        ]

    def test_cdf_frame_count_bounds_extraction(self, tmp_path):
        """When the pose archive is shorter than the video, the CDF frame
        count wins (reference human36m.py:54-57 iterates the CDF length)."""
        _h36m_tree(tmp_path, cdf_frames=7, video_frames=12)
        h36m_train_extract(str(tmp_path), training_split=False,
                           extract_img=True)
        got = sorted(os.listdir(tmp_path / "images"))
        assert got == [
            "S9_Walking.60457274_000001.jpg",
            "S9_Walking.60457274_000006.jpg",
        ]

    def test_extract_img_false_writes_nothing(self, tmp_path):
        """The kwarg the reference's dispatcher passes but its function
        lacks (latent TypeError, reference process_data.py:13)."""
        _h36m_tree(tmp_path)
        h36m_train_extract(str(tmp_path), training_split=False,
                           extract_img=False)
        assert os.listdir(tmp_path / "images") == []


def _coco_person(x0=100.0, y0=100.0, height=400.0, score=3.0, conf=0.9):
    """17 COCO keypoints spread over a (height x height/2) box."""
    xs = np.linspace(x0, x0 + height / 2, 17)
    ys = np.linspace(y0, y0 + height, 17)
    kp = np.stack([xs, ys, np.full(17, conf)], 1)
    return {"image_id": "f0.png", "score": score,
            "keypoints": kp.reshape(-1).tolist()}


class TestInternetExtract:
    def test_filters_and_npz_contents(self, tmp_path):
        annots = [
            _coco_person(score=3.0, height=400.0),           # kept
            _coco_person(score=1.0, height=400.0),           # low score
            _coco_person(score=3.0, height=100.0),           # too small
        ]
        with open(tmp_path / "seq01.json", "w") as f:
            json.dump(annots, f)

        internet_data_extract(str(tmp_path))

        d = np.load(tmp_path / "seq01.npz")
        assert list(d["imgname"]) == [os.path.join("seq01", "f0.png")]
        assert d["part"].shape == (1, 49, 3)
        # COCO joints scatter into the SPIN layout; confidences binarized
        part = d["part"][0]
        assert set(np.unique(part[:, 2])) == {0.0, 1.0}
        assert part[:, 2].sum() == 17
        # bbox center/scale from keypoint extremes (scaleFactor = 1.0,
        # reference internet_data.py:9)
        kp = np.asarray(annots[0]["keypoints"]).reshape(17, 3)
        lo, hi = kp[:, :2].min(0), kp[:, :2].max(0)
        np.testing.assert_allclose(d["center"][0],
                                   [(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2])
        np.testing.assert_allclose(d["scale"][0],
                                   max(hi[0] - lo[0], hi[1] - lo[1]) / 200.0)

    def test_person_height_uses_visible_joints_only(self):
        kp = np.zeros((17, 3))
        kp[0] = [0, 0, 0.9]
        kp[1] = [30, 40, 0.9]
        kp[2] = [1000, 1000, 0.1]  # below CONF_THRESHOLD: ignored
        assert person_height(kp) == pytest.approx(50.0)


class TestProcessDataCLI:
    def test_h36m_dispatch(self, tmp_path, monkeypatch):
        """Dispatches with extract_img=False exactly like the reference's
        call site — which there raises the latent TypeError (reference
        process_data.py:13 vs human36m.py:25); here it must run clean."""
        _h36m_tree(tmp_path)
        monkeypatch.setattr(
            process_data, "Paths",
            lambda: type("P", (), {"h36m_root": str(tmp_path),
                                   "internet_root": str(tmp_path)})())
        process_data.main(["--dataset", "h36m"])
        assert os.listdir(tmp_path / "images") == []

    def test_internet_dispatch(self, tmp_path, monkeypatch):
        with open(tmp_path / "seqA.json", "w") as f:
            json.dump([_coco_person()], f)
        monkeypatch.setattr(
            process_data, "Paths",
            lambda: type("P", (), {"internet_root": str(tmp_path)})())
        process_data.main(["--dataset", "internet"])
        assert (tmp_path / "seqA.npz").exists()

    def test_requires_dataset_flag(self):
        with pytest.raises(SystemExit):
            process_data.main([])
