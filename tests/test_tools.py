"""Tests for the offline tooling (sweep driver grid logic)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from sweep import parse_grid  # noqa: E402


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
