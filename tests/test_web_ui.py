"""Live tests for the zero-dependency browser UI (tools/diffusion/web_ui.py).

Same capability surface as the reference Gradio app
(``tools/diffusion/gradio_ui.py``): page + info endpoint + convert POST with
speaker / pitch / sampler-interval controls, audio wav in and out.
"""

import sys
import threading
import urllib.request
from http.server import HTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.diffusion.flask_api import (  # noqa: E402
    float_to_wav_bytes,
    wav_bytes_to_float,
)
from tools.diffusion.web_ui import make_handler  # noqa: E402
from tests.test_flask_api import EchoEngine, _multipart  # noqa: E402


def _serve(speaker_mapping=None):
    engine = EchoEngine()
    server = HTTPServer(
        ("127.0.0.1", 0), make_handler(engine, speaker_mapping)
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return engine, server, port


def test_page_and_info():
    _, server, port = _serve({"alice": 0, "bob": 1})
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ) as resp:
            page = resp.read().decode()
            assert resp.status == 200
            assert "Sampler Interval" in page and "Convert" in page

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/info", timeout=10
        ) as resp:
            import json

            info = json.loads(resp.read())
            assert info["speakers"] == ["alice", "bob"]
            assert info["sampling_rate"] == 44100
    finally:
        server.shutdown()


def test_convert_roundtrip():
    engine, server, port = _serve()
    try:
        sr = 44100
        tone = (0.3 * np.sin(np.linspace(0, 440 * 2 * np.pi, sr // 4))).astype(
            np.float32
        )
        body, ctype = _multipart(
            {"fPitchChange": -3, "sSpeakId": 2, "samplerInterval": 25},
            float_to_wav_bytes(tone, sr),
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/convert",
            data=body,
            headers={"Content-Type": ctype.decode()},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            out, out_sr = wav_bytes_to_float(resp.read())

        assert out_sr == sr
        call = engine.calls[0]
        assert call["speakers"] == 2 and call["pitch"] == -3.0
        n = min(len(out), len(tone))
        assert np.corrcoef(out[:n], tone[:n])[0, 1] > 0.999
    finally:
        server.shutdown()
