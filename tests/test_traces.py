"""Trace-layer unit tests: incremental render cache (traceCache analog)."""


def test_trace_render_cache_incremental():
    """Cold chunks render once and reuse (traceCache, json_out.c:1501)."""
    from readsb_tpu.track import traces as tmod
    from readsb_tpu.track.traces import (
        Trace, render_full_cached, trace_rows, mark_legs,
    )

    tr = Trace()
    t0 = 1_000_000
    # two frozen chunks (256 points each) + live points
    from readsb_tpu.track.traces import TRACE_RECENT_POINTS

    n_pts = 256 * 2 + TRACE_RECENT_POINTS + 40
    for i in range(n_pts):
        from readsb_tpu.track.traces import State

        tr._commit(State(timestamp=t0 + i * 10_000, lat=40 + i * 1e-4,
                         lon=5.0, baro_alt=10000 + i))
    assert len(tr.chunks) == 2
    now = t0 + n_pts * 10_000 + tmod.TRACE_CACHE_COLD_MS + 1

    rows_cold, warm, ref = render_full_cached(tr, now)
    mark_legs(warm)
    full_rows = rows_cold + trace_rows(warm, ref)
    assert len(full_rows) == n_pts
    assert len(rows_cold) == 512  # both chunks cold

    # second render hits the cache (identical output, same object reuse)
    rows_cold2, _, ref2 = render_full_cached(tr, now)
    assert ref2 == ref and rows_cold2 == rows_cold

    # baseline equality: cached render == full re-render
    states = tr.full()
    mark_legs(states)
    baseline = trace_rows(states, ref)
    assert full_rows == baseline

    # pruning the first chunk rebases and invalidates cleanly
    tr.prune(keep_after_ts=t0 + 256 * 10_000)
    rows_cold3, warm3, ref3 = render_full_cached(tr, now)
    assert ref3 >= t0 + 256 * 10_000
    assert len(rows_cold3) + len(warm3) == tr.len_total  # prune updates len_total
