"""Native FrameSink (C++ ring buffer + writer thread) tests."""

import glob
import os

import numpy as np

from bevy_gpu_fluid_tpu.native import FrameSink


def _read_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        f.readline()
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def test_framesink_roundtrip(tmp_path):
    out = str(tmp_path)
    frames = [np.full((32, 64, 3), i * 7 % 256, np.uint8) for i in range(20)]
    with FrameSink(out, width=64, height=32, slots=4) as sink:
        for f in frames:
            while not sink.push(f):   # ring full -> wait-and-retry in test
                pass
        sink.flush()
        assert sink.written == 20

    files = sorted(glob.glob(os.path.join(out, "frame_*.ppm")))
    assert len(files) == 20
    for i, path in enumerate(files):
        np.testing.assert_array_equal(_read_ppm(path), frames[i])


def test_framesink_never_blocks(tmp_path):
    # pushes beyond ring capacity return False instead of blocking
    sink = FrameSink(str(tmp_path), width=2048, height=2048, slots=2)
    f = np.zeros((2048, 2048, 3), np.uint8)
    results = [sink.push(f) for _ in range(50)]
    assert any(results)
    sink.close()
    assert sink.written + sink.dropped == 50
    assert sink.written >= 2
