"""Tests for the offline tooling (sweep driver grid logic)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import numpy as np  # noqa: E402

from sweep import parse_grid  # noqa: E402
from build_retrieval import kmeans  # noqa: E402
from fullscale_parity import merge_record  # noqa: E402


class TestSweepGrid:
    def test_product_expansion(self):
        combos = parse_grid(["lr=1e-6,3e-6", "interval=2,5,7"])
        assert len(combos) == 6
        assert {"lr": "1e-6", "interval": "2"} in combos
        assert {"lr": "3e-6", "interval": "7"} in combos

    def test_single_axis(self):
        assert parse_grid(["seed=1"]) == [{"seed": "1"}]

    def test_host_sharding_covers_grid_disjointly(self):
        combos = parse_grid(["a=1,2,3", "b=x,y"])
        shards = [combos[i::3] for i in range(3)]
        flat = [c for s in shards for c in s]
        assert len(flat) == len(combos)
        assert all(c in combos for c in flat)
        # disjoint
        seen = [tuple(sorted(c.items())) for c in flat]
        assert len(set(seen)) == len(seen)

    def test_rejects_malformed_spec(self):
        with pytest.raises(ValueError):
            parse_grid(["lr"])


class TestRetrievalKMeans:
    def test_recovers_separated_clusters(self):
        """The store builder's k-means must recover well-separated clusters
        (the shape of the reference's precomputed retrieval_res assets)."""
        rng = np.random.default_rng(0)
        true_centers = rng.normal(size=(4, 32)) * 5
        feats = np.concatenate([
            true_centers[k] + rng.normal(scale=0.05, size=(25, 32))
            for k in range(4)
        ]).astype(np.float32)
        centers, assign = kmeans(feats, k=4, seed=1)
        assert centers.shape == (4, 32)
        # members of one true cluster share one assignment
        for k in range(4):
            block = assign[k * 25:(k + 1) * 25]
            assert (block == block[0]).all()
        # and the four blocks map to four distinct clusters
        assert len({int(assign[k * 25]) for k in range(4)}) == 4

    def test_centers_are_unit_norm(self):
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(30, 16)).astype(np.float32)
        centers, _ = kmeans(feats, k=3, seed=0)
        np.testing.assert_allclose(np.linalg.norm(centers, axis=1), 1.0,
                                   atol=1e-5)


class TestParityRecordMerge:
    """The PARITY_FULLSCALE.json merge must be symmetric: neither arm may
    clobber the other's committed evidence (each costs tens of CPU-minutes
    to regenerate)."""

    def test_retrieval_run_preserves_base(self):
        base = {"frames": 5, "checks": "PASSED"}
        ret = {"frames": 5, "retrieval": True}
        out = merge_record(base, ret, retrieval=True)
        assert out["frames"] == 5 and out["checks"] == "PASSED"
        assert out["retrieval_on"] is ret

    def test_base_rerun_preserves_retrieval_arm(self):
        on_disk = {"frames": 3, "retrieval_on": {"frames": 5}}
        fresh = {"frames": 7}
        out = merge_record(on_disk, fresh, retrieval=False)
        assert out["frames"] == 7                      # base keys replaced
        assert out["retrieval_on"] == {"frames": 5}    # arm preserved

    def test_retrieval_rerun_replaces_only_that_arm(self):
        on_disk = {"frames": 3, "retrieval_on": {"frames": 5}}
        fresh = {"frames": 9}
        out = merge_record(on_disk, fresh, retrieval=True)
        assert out["frames"] == 3
        assert out["retrieval_on"] == {"frames": 9}

    def test_empty_disk_both_arms(self):
        assert merge_record({}, {"a": 1}, retrieval=False) == {"a": 1}
        assert merge_record({}, {"a": 1}, retrieval=True) == \
            {"retrieval_on": {"a": 1}}

    def test_inputs_not_mutated(self):
        on_disk = {"frames": 3}
        fresh = {"frames": 5}
        merge_record(on_disk, fresh, retrieval=True)
        assert on_disk == {"frames": 3} and fresh == {"frames": 5}
