"""utils/timing.py unit coverage (reference: utils/timing.py:14-146 —
named timers w/ device sync, <=500 rolling samples, trimmed mean,
JSON snapshot)."""

import json

import jax.numpy as jnp

from deftet_tpu.utils.timing import Timer, TimingRegistry


def test_timer_rolling_window_and_stats():
    t = Timer("x", max_samples=10)
    for i in range(25):
        t.start()
        t.stop()
    assert len(t.samples) == 10
    # inject known samples to pin the statistics
    t.samples = [1.0, 2.0, 3.0, 4.0, 100.0]
    assert t.median() == 3.0
    # 10% trim of 5 samples trims 0 -> plain mean
    assert abs(t.trimmed_mean() - 22.0) < 1e-9
    t.samples = sorted([1.0] * 9 + [100.0])
    # 10% trim of 10 drops one from each end
    assert abs(t.trimmed_mean() - 1.0) < 1e-9
    s = t.summary()
    assert s["count"] == 10 and s["last"] == 100.0


def test_registry_region_sync_and_snapshot(tmp_path):
    reg = TimingRegistry(enabled=True)
    out = jnp.zeros((8,))
    with reg.region("fwd", block_on_fn=lambda: out):
        out = out + 1.0
    with reg.region("fwd"):
        pass
    snap = reg.snapshot()
    assert snap["fwd"]["count"] == 2
    assert snap["fwd"]["mean"] >= 0.0
    p = tmp_path / "timing.json"
    reg.save(str(p))
    assert json.loads(p.read_text())["fwd"]["count"] == 2


def test_registry_disabled_is_noop():
    reg = TimingRegistry(enabled=False)
    with reg.region("never"):
        pass
    assert reg.snapshot() == {}
