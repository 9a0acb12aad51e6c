"""Unit tests for the JSONL ScalarWriter (replaces the reference's
TensorBoard SummaryWriter, base_adaptor.py:43,445-447)."""

import json

from dynaboa_tpu.metrics.writer import ScalarWriter


class TestScalarWriter:
    def test_roundtrip_and_key_preservation(self, tmp_path):
        w = ScalarWriter(str(tmp_path), flush_secs=0.0)
        w.write(0, {"ll/kp2d": 1.5, "metrics/mpjpe": 64.2})
        w.write(1, {"feat_sim/cos_sim": 0.999})
        w.flush()

        lines = [json.loads(l) for l in
                 (tmp_path / "scalars.jsonl").read_text().splitlines()]
        assert [l["step"] for l in lines] == [0, 1]
        assert lines[0]["ll/kp2d"] == 1.5
        assert lines[0]["metrics/mpjpe"] == 64.2
        assert lines[1]["feat_sim/cos_sim"] == 0.999
        assert all("t" in l for l in lines)
        w.close()

    def test_non_numeric_values_skipped(self, tmp_path):
        w = ScalarWriter(str(tmp_path), flush_secs=0.0)
        w.write(0, {"good": 1.0, "bad": "a string", "worse": [1, 2]})
        w.flush()
        rec = json.loads((tmp_path / "scalars.jsonl").read_text())
        assert rec["good"] == 1.0
        assert "bad" not in rec and "worse" not in rec
        w.close()

    def test_append_mode_preserves_prior_runs(self, tmp_path):
        w1 = ScalarWriter(str(tmp_path), flush_secs=0.0)
        w1.write(0, {"x": 1.0})
        w1.close()
        w2 = ScalarWriter(str(tmp_path), flush_secs=0.0)
        w2.write(1, {"x": 2.0})
        w2.close()
        lines = (tmp_path / "scalars.jsonl").read_text().splitlines()
        assert len(lines) == 2

    def test_time_gated_flush(self, tmp_path):
        w = ScalarWriter(str(tmp_path), flush_secs=3600.0)
        w.write(0, {"x": 1.0})
        # gate not yet elapsed: the line may sit in the buffer
        w.flush()  # explicit flush forces it out regardless
        assert len((tmp_path / "scalars.jsonl").read_text().splitlines()) == 1
        w.close()
