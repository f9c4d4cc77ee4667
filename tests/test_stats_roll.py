"""StatsCollector window mechanics: per-minute roll, 5/15-min windows,
totals (statsUpdate, stats.c:470)."""

from types import SimpleNamespace

from readsb_tpu.io.stats import StatsCollector


class _Tracker(SimpleNamespace):
    pass


def _app(messages=0, **counters):
    base = {k: 0 for k in (
        "cpr_surface", "cpr_airborne", "cpr_global_ok", "cpr_global_bad",
        "cpr_global_skipped", "cpr_global_speed_checks", "cpr_local_ok",
        "cpr_local_skipped", "cpr_local_aircraft_relative",
        "cpr_local_receiver_relative", "cpr_local_range_checks",
        "cpr_local_speed_checks", "cpr_filtered",
        "tracks_all", "tracks_single_message",
    )}
    base.update(counters)
    return SimpleNamespace(
        tracker=_Tracker(**base),
        messages=messages,
        _demod=None,
        args=SimpleNamespace(net=True, net_only=False),
    )


def test_minute_roll_and_windows():
    sc = StatsCollector()
    app = _app()
    t0 = 1000.0
    # 20 minutes of one message per second
    for minute in range(20):
        app.messages += 60
        app.tracker.cpr_global_ok += 2
        sc.sample(app, t0 + 60 * (minute + 1))
    assert len(sc.minutes) == 15  # ring capped at 15 one-minute periods
    doc = sc.stats_json(app, t0 + 20 * 60)
    assert doc["last1min"]["messages"] == 60
    assert doc["last5min"]["messages"] == 5 * 60
    assert doc["last15min"]["messages"] == 15 * 60
    assert doc["total"]["messages"] == 20 * 60
    assert doc["last5min"]["cpr"]["global_ok"] == 10
    assert doc["total"]["cpr"]["global_ok"] == 40
    # window timestamps cover the right spans
    w5 = doc["last5min"]
    assert w5["end"] - w5["start"] >= 4 * 60


def test_rtt_histogram_buckets():
    sc = StatsCollector()
    sc.note_rtt(1.0)
    sc.note_rtt(25.0)
    sc.note_rtt(10_000.0)
    assert sc.remote_ping_rtt[0] >= 1
    assert sc.remote_ping_rtt[-1] >= 1
    assert sum(sc.remote_ping_rtt) == 3
