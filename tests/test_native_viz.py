import numpy as np
import pytest

from dynaboa_tpu import native_lib
from dynaboa_tpu.ops import image as I
from dynaboa_tpu import constants
from dynaboa_tpu.viz.renderer import (
    Renderer,
    _render_numpy,
    convert_crop_cam_to_orig_img,
)

needs_native = pytest.mark.skipif(not native_lib.available(),
                                  reason="native lib not built")


class TestNativeImageOps:
    @needs_native
    def test_matches_host_numpy_path(self, rng):
        img = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
        center, scale = [320.0, 240.0], 1.1
        want = I.crop_numpy(img, center, scale, [224, 224],
                            anti_aliasing=False)
        want = (want / 255.0 - constants.IMG_NORM_MEAN) / constants.IMG_NORM_STD

        got = native_lib.crop_resize_normalize(img, center, scale,
                                               out_res=224, supersample=1)
        assert np.abs(got - want.astype(np.float32)).max() < 1e-3

    @needs_native
    def test_zero_padding_out_of_bounds(self, rng):
        img = rng.uniform(10, 255, size=(100, 100, 3)).astype(np.float32)
        got = native_lib.crop_resize_normalize(img, [0.0, 0.0], 1.0)
        # out-of-image corner is zero-padded -> normalized zero value
        want0 = (0.0 - constants.IMG_NORM_MEAN) / constants.IMG_NORM_STD
        np.testing.assert_allclose(got[:40, :40],
                                   np.broadcast_to(want0, (40, 40, 3)),
                                   atol=1e-5)


class TestRasterizer:
    def _tri(self):
        # one large triangle facing the camera, centered
        verts = np.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0],
                          [0.0, 0.5, 0.0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        cam = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        return verts, faces, cam

    @needs_native
    def test_native_covers_center(self):
        verts, faces, cam = self._tri()
        rgba = native_lib.render_mesh(verts, faces, cam, 64, 64)
        assert rgba[32, 32, 3] > 0          # center covered
        assert rgba[2, 2, 3] == 0           # corner not covered
        assert rgba[32, 32, :3].max() > 0   # shaded

    @needs_native
    def test_native_matches_numpy_fallback(self):
        verts, faces, cam = self._tri()
        a = native_lib.render_mesh(verts, faces, cam, 64, 64)
        b = _render_numpy(verts, faces, cam, 64, 64, (1.0, 1.0, 0.9))
        # coverage masks agree except possibly at triangle edges
        diff = (a[:, :, 3] > 0) != (b[:, :, 3] > 0)
        assert diff.mean() < 0.02

    def test_zbuffer_occlusion(self):
        # two stacked triangles: the closer one (larger z after flip -> here
        # *smaller* raw z since the flip negates z) must win
        verts = np.array([
            [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0],   # far
            [-0.5, -0.5, -1.0], [0.5, -0.5, -1.0], [0.0, 0.5, -1.0],  # near
        ], np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        cam = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        img = np.zeros((64, 64, 3), np.uint8)
        r = Renderer(faces=faces)
        out1 = r.render(img, verts, cam, color=(1, 0, 0),
                        faces=np.array([[0, 1, 2]], np.int32))
        out2 = r.render(img, verts, cam, color=(0, 1, 0),
                        faces=np.array([[3, 4, 5]], np.int32))
        both = r.render(img, verts, cam, color=(1, 0, 0), faces=faces)
        # with one color, both tris rendered: center pixel must match the
        # near triangle's depth-winning shading, which has the same normal
        assert both[32, 32].max() > 0
        assert out1[32, 32].max() > 0 and out2[32, 32].max() > 0

    def test_convert_crop_cam(self):
        cam = np.array([[1.0, 0.1, -0.2]])
        bbox = np.array([[320.0, 240.0, 200.0]])
        out = convert_crop_cam_to_orig_img(cam, bbox, 640, 480)
        assert out.shape == (1, 4)
        np.testing.assert_allclose(out[0, 0], 200.0 / 640.0, rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], 200.0 / 480.0, rtol=1e-6)
        # centered bbox -> translation = cam translation
        np.testing.assert_allclose(out[0, 2], 0.1, atol=1e-6)
        np.testing.assert_allclose(out[0, 3], -0.2, atol=1e-6)


class TestFrameRing:
    @needs_native
    def test_push_read_roundtrip(self):
        ring = native_lib.FrameRing(4, (8, 8, 3))
        assert ring.read_latest() == (0, None)
        f1 = np.full((8, 8, 3), 7, np.uint8)
        t1 = ring.push(f1)
        assert t1 == 1
        t, out = ring.read_latest()
        assert t == 1
        np.testing.assert_array_equal(out, f1)
        for i in range(10):
            ring.push(np.full((8, 8, 3), i, np.uint8))
        t, out = ring.read_latest()
        assert t == 11
        np.testing.assert_array_equal(out, np.full((8, 8, 3), 9, np.uint8))


class TestStreamPreprocess:
    def test_keypoints_to_frame(self, rng):
        from dynaboa_tpu.apps.stream import keypoints_to_frame

        img = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, :, 0] = rng.uniform(200, 400, 25)
        kp[0, :, 1] = rng.uniform(100, 400, 25)
        kp[0, :, 2] = 0.9
        crop, j2d49, bbox = keypoints_to_frame(img, kp)
        assert crop.shape == (224, 224, 3)
        assert j2d49.shape == (49, 3)
        # conf binarized, GT half zero
        assert set(np.unique(j2d49[:25, 2])) <= {0.0, 1.0}
        np.testing.assert_allclose(j2d49[25:], 0.0)
        # bbox center is the keypoint extent center
        lo, hi = kp[0, :, :2].min(0), kp[0, :, :2].max(0)
        np.testing.assert_allclose(bbox[:2], (lo + hi) / 2, rtol=1e-5)
