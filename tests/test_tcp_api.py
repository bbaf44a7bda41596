"""Realtime TCP API: frame processor semantics + a live socket roundtrip
(parity: reference tools/diffusion/tcp_api.py — 3 s float32 frames, silence
gating, converted frames echoed back)."""

import socket
import sys
import threading
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.diffusion.tcp_api import make_frame_processor, serve  # noqa: E402


class EchoEngine:
    sampling_rate = 44100

    def __init__(self):
        self.calls = 0

    def forward(self, audio, speakers, pitch_adjust=0.0):
        self.calls += 1
        return audio * 0.5


def test_silence_gating_skips_model():
    engine = EchoEngine()
    process = make_frame_processor(engine, 0, silence_db=-40.0)

    loud = np.full(1000, 0.3, np.float32)
    out = process(loud)
    assert engine.calls == 1
    np.testing.assert_allclose(out, loud * 0.5)

    quiet = np.full(1000, 1e-4, np.float32)
    out = process(quiet)
    assert engine.calls == 1  # gated, model untouched
    assert (out == 0).all()


def test_short_output_padded():
    class ShortEngine(EchoEngine):
        def forward(self, audio, speakers, pitch_adjust=0.0):
            return audio[: len(audio) // 2]

    process = make_frame_processor(ShortEngine(), 0)
    out = process(np.full(100, 0.3, np.float32))
    assert len(out) == 100
    assert (out[50:] == 0).all()


def test_socket_roundtrip():
    frame_samples = 4096
    engine = EchoEngine()
    process = make_frame_processor(engine, 0)

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", 0))
    sock.listen(1)
    port = sock.getsockname()[1]

    t = threading.Thread(
        target=serve, args=(sock, process, frame_samples),
        kwargs=dict(max_clients=1), daemon=True,
    )
    t.start()

    frame = (0.3 * np.sin(np.linspace(0, 300, frame_samples))).astype(np.float32)
    client = socket.create_connection(("127.0.0.1", port), timeout=10)
    # two frames streamed in arbitrary chunk sizes
    payload = frame.tobytes() * 2
    for i in range(0, len(payload), 10000):
        client.sendall(payload[i : i + 10000])

    expect = len(payload)
    got = b""
    client.settimeout(10)
    while len(got) < expect:
        got += client.recv(65536)
    client.close()
    t.join(timeout=10)

    out = np.frombuffer(got, np.float32)
    np.testing.assert_allclose(out[:frame_samples], frame * 0.5, atol=1e-6)
    np.testing.assert_allclose(out[frame_samples:], frame * 0.5, atol=1e-6)
    assert engine.calls == 2
