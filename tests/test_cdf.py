import numpy as np
import pytest

from dynaboa_tpu.data.preprocess.cdf import (
    CDFReadError,
    read_cdf,
    write_cdf,
)


class TestCDF:
    def test_roundtrip_pose_like_variable(self, tmp_path, rng):
        # same shape family as H36M D3_Positions_mono 'Pose' archives
        data = rng.normal(size=(1, 120, 96))
        p = str(tmp_path / "pose.cdf")
        write_cdf(p, "Pose", data)
        out = read_cdf(p)
        assert list(out) == ["Pose"]
        assert out["Pose"].shape == (1, 120, 96)
        np.testing.assert_allclose(out["Pose"], data, rtol=1e-12)

    def test_multi_record_variable(self, tmp_path, rng):
        data = rng.normal(size=(5, 7))
        p = str(tmp_path / "multi.cdf")
        write_cdf(p, "Var", data)
        out = read_cdf(p)
        np.testing.assert_allclose(out["Var"], data, rtol=1e-12)

    def test_rejects_non_cdf(self, tmp_path):
        p = str(tmp_path / "junk.cdf")
        with open(p, "wb") as f:
            f.write(b"not a cdf file at all, definitely" * 4)
        with pytest.raises(CDFReadError):
            read_cdf(p)
