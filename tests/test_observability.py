"""Progress ticks + memory accounting (the reference's Debug::Progress,
Debug.h:116-208, and MemoryTracker, MemoryTracker.h:8)."""

import numpy as np

from metaeuk_tpu.utils import log


def test_progress_ticks_rate_limited(capfd):
    prog = log.Progress(total=1000, label="units", interval=0.0)
    for _ in range(1000):
        prog.update()
    prog.finish()
    err = capfd.readouterr().err
    assert "[PROG] units 1000/1000 (100.0%)" in err
    assert "ETA" in err


def test_progress_silent_when_fast(capfd):
    # a loop that finishes inside the tick interval emits nothing
    prog = log.Progress(total=10, label="quick", interval=60.0)
    for _ in range(10):
        prog.update()
    prog.finish()
    assert "[PROG]" not in capfd.readouterr().err


def test_memory_tracker_reports_peak_rss(capfd):
    log.MemoryTracker.reset()
    log.MemoryTracker.track("test buffer", 3 << 30)
    log.MemoryTracker.track("test buffer", 1 << 30)  # high-water kept
    log.MemoryTracker.track("small", 100)            # below 1 MiB: hidden
    peak = log.MemoryTracker.report()
    assert peak > 0
    assert peak == log.peak_rss_bytes()
    err = capfd.readouterr().err
    assert "mem test buffer: 3.00 GiB" in err
    assert "mem peak RSS:" in err
    assert "small" not in err
    log.MemoryTracker.reset()


def test_prefilter_chunked_batch_matches_single(capfd, monkeypatch):
    """match_batch_flat chunks large query sets through the native
    engine with progress ticks; per-query outputs and run statistics
    must equal the unchunked path."""
    from metaeuk_tpu.search import prefilter_kmer as pk

    rng = np.random.default_rng(7)
    targets = [rng.integers(0, 20, 80).astype(np.uint8) for _ in range(30)]
    queries = [t.copy() for t in targets] * 4  # 120 queries
    ident = np.tile(np.arange(30, dtype=np.uint32), 4)
    pf = pk.KmerPrefilter(targets)
    base = pf.match_batch(queries, identity_ids=ident)
    stats_base = pf.stats.copy()
    monkeypatch.setattr(pk, "BATCH_CHUNK", 32)
    counts, ids, scs, dgs = pf.match_batch_flat(queries,
                                                identity_ids=ident)
    offs = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    for qi, (bids, bsc, bdg) in enumerate(base):
        np.testing.assert_array_equal(ids[offs[qi]:offs[qi + 1]], bids)
        np.testing.assert_array_equal(scs[offs[qi]:offs[qi + 1]], bsc)
        np.testing.assert_array_equal(dgs[offs[qi]:offs[qi + 1]], bdg)
    np.testing.assert_array_equal(pf.stats, stats_base)
