"""VST HTTP API test: real server, real multipart POST.

Parity target: the reference's ``/voiceChangeModel`` flask contract
(``tools/diffusion/flask_api.py``: wav multipart + fPitchChange/sSpeakId/
sampleRate form fields → wav back). Also pins the multipart fix — an
uploaded payload whose tail bytes are CRLF/dash-valued must survive intact
(the old charset rstrip corrupted them).
"""

import io
import sys
import threading
import urllib.request
import wave
from http.server import HTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.diffusion.flask_api import (  # noqa: E402
    float_to_wav_bytes,
    make_handler,
    parse_multipart,
    wav_bytes_to_float,
)


class EchoEngine:
    sampling_rate = 44100

    def __init__(self):
        self.calls = []

    def parse_speaker(self, s):
        return int(s)

    def forward(self, audio, speakers, pitch_adjust=0.0, **kw):
        self.calls.append(dict(n=len(audio), speakers=speakers, pitch=pitch_adjust))
        return audio


def _multipart(fields, file_bytes, boundary=b"GRAFTBOUNDARY"):
    parts = []
    for k, v in fields.items():
        parts.append(
            b"--" + boundary + b"\r\n"
            b'Content-Disposition: form-data; name="' + k.encode() + b'"\r\n\r\n'
            + str(v).encode() + b"\r\n"
        )
    parts.append(
        b"--" + boundary + b"\r\n"
        b'Content-Disposition: form-data; name="sample"; filename="in.wav"\r\n'
        b"Content-Type: audio/wav\r\n\r\n" + file_bytes + b"\r\n"
    )
    parts.append(b"--" + boundary + b"--\r\n")
    return b"".join(parts), b"multipart/form-data; boundary=" + boundary


def test_multipart_preserves_crlf_dash_tail():
    """Payloads ending in 0x2D/0x0D/0x0A must come back byte-identical."""
    payload = bytes([0x11, 0x22, 0x2D, 0x0D, 0x0A, 0x2D, 0x2D])
    body, ctype = _multipart({"fPitchChange": 1}, payload)
    fields, files = parse_multipart(body, ctype.decode())
    assert files["sample"] == payload
    assert fields["fPitchChange"] == "1"


def test_voice_change_model_roundtrip():
    engine = EchoEngine()
    server = HTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        sr = 44100
        tone = (0.3 * np.sin(np.linspace(0, 440 * 2 * np.pi, sr // 4))).astype(
            np.float32
        )
        wav_in = float_to_wav_bytes(tone, sr)
        body, ctype = _multipart(
            {"fPitchChange": 2.0, "sSpeakId": 1, "sampleRate": sr}, wav_in
        )

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/voiceChangeModel",
            data=body,
            headers={"Content-Type": ctype.decode()},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            out_bytes = resp.read()

        out, out_sr = wav_bytes_to_float(out_bytes)
        assert out_sr == sr
        assert engine.calls and engine.calls[0]["speakers"] == 1
        assert engine.calls[0]["pitch"] == 2.0
        # echo engine: output correlates ~1 with input (int16 quantization)
        n = min(len(out), len(tone))
        c = np.corrcoef(out[:n], tone[:n])[0, 1]
        assert c > 0.999
    finally:
        server.shutdown()


def test_wav_roundtrip_helpers():
    sr = 22050
    x = (0.5 * np.sin(np.linspace(0, 100, 1000))).astype(np.float32)
    back, sr2 = wav_bytes_to_float(float_to_wav_bytes(x, sr))
    assert sr2 == sr
    np.testing.assert_allclose(back, x, atol=1e-3)
