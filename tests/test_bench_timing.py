"""Unit tests for bench.py's stall-trimmed block timing
(_median_blocks): the artifact's error bars must survive a
mid-measurement transport stall (VERDICT r4 item 5) without hiding it.

Pure host logic -- the clock is faked, nothing touches a device.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pytest

import bench


class FakeClock:
    """time.time() stand-in: each run_block call advances the clock by
    the next scripted duration."""

    def __init__(self, durations):
        self.durations = list(durations)
        self.now = 0.0

    def time(self):
        return self.now

    def run_block(self, iters):
        self.now += self.durations.pop(0)


def _run(monkeypatch, durations, key):
    clock = FakeClock(durations)
    monkeypatch.setattr(bench.time, "time", clock.time)
    bench._BLOCK_SPREADS.pop(key, None)
    bench._BLOCK_STALLS.pop(key, None)
    return bench._median_blocks(clock.run_block,
                                n_blocks=len(durations),
                                iters_per_block=10, spread_key=key)


def test_clean_blocks_median_and_spread(monkeypatch):
    durations = [1.00, 1.02, 1.04, 0.98, 1.01]          # seconds/block
    med = _run(monkeypatch, durations, "clean")
    assert med == pytest.approx(1.01 / 10, rel=1e-9)     # middle of 5
    assert bench._BLOCK_SPREADS["clean"] == round(
        (1.04 - 0.98) / 10 / (1.01 / 10), 3)
    assert "clean" not in bench._BLOCK_STALLS


def test_stalled_block_discarded_and_counted(monkeypatch):
    # one 6x transport stall: must not leak into median OR spread,
    # must be counted
    durations = [1.00, 1.02, 6.00, 0.98, 1.01]
    med = _run(monkeypatch, durations, "stall")
    assert med == pytest.approx(1.01 / 10, rel=1e-9)
    # (upper-middle of the 4 survivors)
    assert bench._BLOCK_SPREADS["stall"] < 0.05
    assert bench._BLOCK_STALLS["stall"] == 1


def test_majority_stall_still_visible(monkeypatch):
    # a majority of stalled blocks cannot be silently trimmed away
    durations = [1.0, 5.0, 5.5, 6.0, 5.2]
    _run(monkeypatch, durations, "majority")
    assert bench._BLOCK_STALLS["majority"] == 4


def test_trim_threshold_keeps_honest_variance(monkeypatch):
    # 20% genuine drift is WITHIN the 1.25x keep threshold: reported,
    # not discarded
    durations = [1.0, 1.1, 1.2, 1.15, 1.05]
    _run(monkeypatch, durations, "drift")
    assert "drift" not in bench._BLOCK_STALLS
    assert bench._BLOCK_SPREADS["drift"] == round(0.2 / 1.1, 3)


def _rl_row(step, category, operation, self_time, total_time=0.0,
            hbm_bw=0.0, bound="HBM", infeed=False):
    return {"c": [{"v": step}, {"v": category}, {"v": operation},
                  {"v": self_time}, {"v": total_time}, {"v": hbm_bw},
                  {"v": bound}, {"v": infeed}]}


def test_parse_roofline_table():
    """Fabricated xprof table: per-step rows and infeed-variant
    duplicates must be excluded; bytes = Program hbm_bw x wall; busy =
    sum of non-Program self times."""
    cols = [{"id": k} for k in
            ("step", "category", "operation", "total_self_time",
             "total_time", "hbm_bw", "bound_by",
             "include_infeed_outfeed")]
    wall_us = 25_000.0               # 10 steps, 2.5 ms each
    bw_gib = 500.0 / (2 ** 30 / 1e9)   # 500 GB/s expressed in GiB/s
    rows = []
    for infeed in (True, False):     # the tool's duplicated variants
        rows.append(_rl_row("Total", "Program", "Program", 0.0,
                            wall_us, bw_gib, "HBM", infeed))
        rows.append(_rl_row("Total", "fusion", "op_a", 15_000.0,
                            infeed=infeed))
        rows.append(_rl_row("Total", "fusion", "op_b", 5_000.0,
                            infeed=infeed))
        # per-step rows must be ignored
        rows.append(_rl_row("0", "fusion", "op_a", 1_500.0,
                            infeed=infeed))
    out = bench._parse_roofline_table({"cols": cols, "rows": rows}, 10)
    assert out["bound_by"] == "HBM"
    assert out["wall_ms_per_step"] == pytest.approx(2.5)
    assert out["busy_ms_per_step"] == pytest.approx(2.0)   # 20 ms / 10
    # bytes: 500 GB/s * 25 ms = 12.5 GB -> 1.25 GB/step
    assert out["bytes_per_step"] == pytest.approx(1.25e9, rel=1e-6)
    # achieved bw over busy: 12.5 GB / 20 ms = 625 GB/s
    assert out["achieved_gbps"] == pytest.approx(625.0, rel=1e-6)


def test_parse_roofline_table_rejects_empty():
    cols = [{"id": k} for k in
            ("step", "category", "operation", "total_self_time",
             "total_time", "hbm_bw", "bound_by",
             "include_infeed_outfeed")]
    rows = [_rl_row("Total", "Program", "Program", 0.0, 0.0, 0.0,
                    "Unknown", False)]
    assert bench._parse_roofline_table({"cols": cols, "rows": rows},
                                       10) is None
