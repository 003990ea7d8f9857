"""Native C++ ring buffer: window semantics must match the offline pipeline
exactly, including under chunked pushes and overflow."""

import numpy as np
import pytest

from gaitpd.data.pipeline import window_stream_np


@pytest.fixture(scope="module")
def buffer_cls():
    try:
        from gaitpd.native import StreamWindowBuffer
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native build unavailable: {e}")
    return StreamWindowBuffer


@pytest.mark.parametrize("win,hop", [(8, 8), (8, 4), (6, 5)])
def test_stream_matches_offline_windows(buffer_cls, win, hop):
    rng = np.random.default_rng(0)
    stream = rng.normal(size=(100, 3)).astype(np.float32)
    buf = buffer_cls(3, win, hop, capacity=256)
    # push in uneven chunks like a real sensor feed
    got = []
    i = 0
    for chunk in (7, 13, 1, 29, 50):
        buf.push(stream[i : i + chunk])
        i += chunk
        got.append(buf.pop())
    got = np.concatenate([g for g in got if len(g)], axis=0)
    ref = window_stream_np(stream, win, hop)
    np.testing.assert_array_equal(got, ref)
    assert buf.dropped_frames == 0


def test_overflow_drops_and_realigns(buffer_cls):
    rng = np.random.default_rng(1)
    stream = rng.normal(size=(300, 2)).astype(np.float32)
    buf = buffer_cls(2, 8, 8, capacity=16)  # tiny ring: forces eviction
    buf.push(stream)  # nothing popped in between
    assert buf.dropped_frames > 0
    wins = buf.pop()
    assert len(wins) >= 1
    # every returned window is still hop-grid aligned and contiguous
    ref = window_stream_np(stream, 8, 8)
    for w in wins:
        matches = [np.array_equal(w, r) for r in ref]
        assert any(matches)


def test_ready_counter(buffer_cls):
    buf = buffer_cls(1, 4, 2)
    assert buf.ready == 0
    buf.push(np.zeros((5, 1), np.float32))
    assert buf.ready == 1  # windows at starts 0 (covers 0-3); start 2 needs frame 5
    buf.push(np.zeros((1, 1), np.float32))
    assert buf.ready == 2
