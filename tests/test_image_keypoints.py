import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynaboa_tpu import constants
from dynaboa_tpu.ops import image as I
from dynaboa_tpu.ops import keypoints as K


class TestTransformMath:
    def test_transform_roundtrip(self):
        center, scale, res = [300.0, 250.0], 1.2, [224, 224]
        pt = np.array([100.0, 150.0])
        fwd = I.transform_point(pt, center, scale, res)
        # inverse maps back within the integer-truncation tolerance
        back = I.transform_point(fwd, center, scale, res, invert=1)
        assert np.abs(back - pt).max() <= 2

    def test_crop_bounds_box_size(self):
        center, scale = [300.0, 250.0], 1.0
        ul, br = I.crop_bounds(center, scale, [224, 224])
        # h = 200 * scale -> box is ~200 px square
        assert abs((br[0] - ul[0]) - 200) <= 1
        assert abs((br[1] - ul[1]) - 200) <= 1

    def test_batch_transform_matches_scalar(self, rng):
        center, scale, res = [123.0, 77.0], 0.9, [224, 224]
        pts = rng.uniform(0, 400, size=(17, 2))
        batch = I.transform_points_batch(pts + 1, center, scale, res)
        single = np.stack(
            [I.transform_point(p + 1, center, scale, res) for p in pts]
        )
        np.testing.assert_array_equal(batch, single)


class TestCropNumpy:
    def test_identity_crop(self, rng):
        # A crop centered on a 224-px-tall person at scale 224/200 whose box
        # lies inside the image reproduces the source patch.
        img = rng.uniform(0, 255, size=(400, 400, 3))
        center, scale = [200.0, 200.0], 224.0 / 200.0
        out = I.crop_numpy(img, center, scale, [224, 224], anti_aliasing=False)
        ul, br = I.crop_bounds(center, scale, [224, 224])
        patch = img[ul[1]:br[1], ul[0]:br[0]]
        assert patch.shape == (224, 224, 3)
        np.testing.assert_allclose(out, patch, atol=1e-6)

    def test_out_of_bounds_zero_padded(self, rng):
        img = rng.uniform(10, 255, size=(100, 100, 3))
        out = I.crop_numpy(img, [0.0, 0.0], 1.0, [224, 224], anti_aliasing=False)
        # upper-left quadrant of the crop comes from outside the image
        assert np.all(out[:40, :40] == 0.0)
        assert out.shape == (224, 224, 3)

    def test_matches_cv2_bilinear_when_no_padding(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.uniform(0, 255, size=(500, 500, 3)).astype(np.float32)
        center, scale = [250.0, 250.0], 1.5
        out = I.crop_numpy(img, center, scale, [224, 224], anti_aliasing=False)
        ul, br = I.crop_bounds(center, scale, [224, 224])
        patch = img[ul[1]:br[1], ul[0]:br[0]]
        want = cv2.resize(patch, (224, 224), interpolation=cv2.INTER_LINEAR)
        assert np.abs(out - want).mean() < 0.5  # same convention, fp tolerance


class TestFusedCrop:
    def test_matches_host_path(self, rng):
        img = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
        center = np.array([320.0, 240.0], np.float32)
        scale = np.float32(1.1)

        host = I.crop_numpy(img, center, scale, [224, 224], anti_aliasing=False)
        host = host.transpose(2, 0, 1) / 255.0
        host = (host - constants.IMG_NORM_MEAN[:, None, None]) / \
            constants.IMG_NORM_STD[:, None, None]

        dev = I.fused_crop_resize_normalize(
            jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale),
            supersample=1,
        )
        dev = np.asarray(dev).transpose(2, 0, 1)
        assert np.abs(dev - host).max() < 5e-2
        assert np.abs(dev - host).mean() < 5e-3

    def test_jittable_with_dynamic_box(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32))
        fn = jax.jit(I.fused_crop_resize_normalize)
        out1 = fn(img, jnp.asarray([100.0, 100.0]), jnp.asarray(0.8))
        out2 = fn(img, jnp.asarray([500.0, 300.0]), jnp.asarray(1.4))
        assert out1.shape == (224, 224, 3)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestKeypoints:
    def test_spin_has_49_joints(self):
        assert len(K.joint_names("spin")) == 49
        assert len(K.joint_names("coco")) == 17
        assert len(K.joint_names("h36m")) == 17

    def test_spin_matches_constants_taxonomy(self):
        # GT-half names of the spin format map 1:1 onto constants.JOINT_NAMES
        assert K.joint_names("spin")[:25] == tuple(constants.JOINT_NAMES[:25])

    def test_perm_idxs_spin_to_coco(self):
        idxs = K.get_perm_idxs("spin", "coco")
        spin = K.joint_names("spin")
        coco = K.joint_names("coco")
        assert [spin[i] for i in idxs] == [n for n in coco if n in spin]

    def test_convert_roundtrip_preserves_shared_joints(self, rng):
        kp = rng.normal(size=(2, 17, 3))
        spin_kp = K.convert_kps(kp, "coco", "spin")
        back = K.convert_kps(spin_kp, "spin", "coco")
        # every coco joint exists in spin, so the roundtrip is lossless
        np.testing.assert_allclose(back, kp)

    def test_missing_joints_are_zero(self, rng):
        kp = rng.normal(size=(1, 14, 3))
        out = K.convert_kps(kp, "common", "spin")
        spin = K.joint_names("spin")
        common = K.joint_names("common")
        for i, n in enumerate(spin):
            if n not in common:
                np.testing.assert_allclose(out[:, i], 0.0)

    def test_hflip(self):
        kp = np.array([[10.0, 5.0], [0.0, 0.0]])
        out = K.keypoint_hflip(kp, 100)
        np.testing.assert_allclose(out[:, 0], [89.0, 99.0])


class TestAugmentationHelpers:
    def test_flip_kp_involution(self, rng):
        kp = rng.normal(size=(49, 3))
        out = I.flip_kp(I.flip_kp(kp))
        np.testing.assert_allclose(out, kp)

    def test_flip_pose_involution(self, rng):
        pose = rng.normal(size=(72,))
        np.testing.assert_allclose(I.flip_pose(I.flip_pose(pose)), pose)

    def test_rot_aa_zero_is_identity(self, rng):
        aa = rng.normal(scale=0.3, size=3).astype(np.float32)
        np.testing.assert_allclose(I.rot_aa(aa, 0.0), aa, atol=1e-5)

    def test_rot_aa_composes_image_rotation(self):
        # rotating a z-axis orientation by `rot` degrees adds to its angle
        aa = np.array([0.0, 0.0, 0.3], np.float32)
        out = I.rot_aa(aa, -30.0)
        np.testing.assert_allclose(
            out, [0.0, 0.0, 0.3 + np.deg2rad(30)], atol=1e-5)

    def test_uncrop_restores_patch_region(self, rng):
        img = (rng.uniform(0, 255, size=(100, 100, 3))).astype(np.float64)
        center, scale = [50.0, 50.0], 0.25  # 50x50 box inside the image
        crop = I.crop_numpy(img, center, scale, [50, 50],
                            anti_aliasing=False)
        restored = I.uncrop(crop, center, scale, (100, 100, 3))
        ul, br = I.crop_bounds(center, scale, [50, 50])
        inner = restored[ul[1] + 1:br[1] - 1, ul[0] + 1:br[0] - 1]
        want = img[ul[1] + 1:br[1] - 1, ul[0] + 1:br[0] - 1]
        assert np.abs(inner.astype(np.float64) - want).mean() < 2.0

    def test_skeleton_tables(self):
        sk = K.get_skeleton("spin")
        assert sk.shape == (25, 2)
        assert sk.max() < 49
        with pytest.raises(ValueError):
            K.get_skeleton("nope")


class TestFormatMatrix:
    """Exhaustive checks over the full 15-format taxonomy (reference
    kp_utils.py get_*_joint_names): format sizes match the reference
    tables, and every (src, dst) conversion preserves shared joints and
    zeros the rest."""

    # joint counts of the reference's tables, derived once from
    # /root/reference/utils/kp_utils.py
    REF_SIZES = {
        "spin": 49, "h36m": 17, "coco": 17, "common": 14, "mpii": 16,
        "mpii3d": 28, "mpii3d_test": 17, "3dpw": 14, "smplcoco": 19,
        "smpl": 24, "posetrack": 17, "pennaction": 13, "aich": 14,
        "insta": 25, "staf": 21,
    }

    def test_all_reference_formats_present_with_exact_sizes(self):
        assert set(K.JOINT_FORMATS) == set(self.REF_SIZES)
        for fmt, n in self.REF_SIZES.items():
            assert len(K.joint_names(fmt)) == n, fmt

    def test_every_pair_converts_correctly(self, rng):
        fmts = sorted(K.JOINT_FORMATS)
        for src in fmts:
            src_names = K.joint_names(src)
            kp = rng.normal(size=(2, len(src_names), 3)).astype(np.float32)
            for dst in fmts:
                out = K.convert_kps(kp, src, dst)
                dst_names = K.joint_names(dst)
                assert out.shape == (2, len(dst_names), 3), (src, dst)
                for i, name in enumerate(dst_names):
                    if name in src_names:
                        np.testing.assert_array_equal(
                            out[:, i], kp[:, src_names.index(name)],
                            err_msg=f"{src}->{dst}:{name}")
                    else:
                        assert np.all(out[:, i] == 0.0), (src, dst, name)

    def test_self_conversion_is_identity(self, rng):
        for fmt in K.JOINT_FORMATS:
            n = len(K.joint_names(fmt))
            kp = rng.normal(size=(1, n, 3)).astype(np.float32)
            np.testing.assert_array_equal(K.convert_kps(kp, fmt, fmt), kp)

    def test_skeleton_edges_in_range(self):
        for fmt, edges in K.SKELETONS.items():
            n = len(K.joint_names(fmt))
            sk = K.get_skeleton(fmt)
            assert sk.min() >= 0 and sk.max() < n, fmt
