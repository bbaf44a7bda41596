"""HTTP voice-change API for the HiFiSinger (GAN) models.

Capability parity with the reference ``tools/hifisinger/flask_api.py``: same
``/voiceChangeModel`` contract as the diffusion API, served by the direct
waveform generator (no diffusion loop) for low latency.
"""

from __future__ import annotations

import argparse
import io
import re
import sys
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def parse_multipart(body: bytes, content_type: str):
    """Minimal multipart/form-data parser (fields + one file)."""
    m = re.search(r"boundary=([^;]+)", content_type)
    if not m:
        raise ValueError("no multipart boundary")
    boundary = m.group(1).strip('"').encode()

    fields, files = {}, {}
    for part in body.split(b"--" + boundary):
        if b"\r\n\r\n" not in part:
            continue
        header, _, content = part.partition(b"\r\n\r\n")
        # strip exactly the one CRLF that precedes the next boundary; an
        # rstrip over a charset would eat trailing 0x2D/0x0D/0x0A bytes that
        # are genuinely part of the uploaded PCM payload
        if content.endswith(b"\r\n"):
            content = content[:-2]
        header_text = header.decode(errors="ignore")
        name_m = re.search(r'name="([^"]+)"', header_text)
        if not name_m:
            continue
        name = name_m.group(1)
        if 'filename="' in header_text:
            files[name] = content
        else:
            fields[name] = content.decode(errors="ignore").strip()
    return fields, files


def wav_bytes_to_float(data: bytes):
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        audio = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    else:
        audio = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    if channels > 1:
        audio = audio.reshape(-1, channels).mean(axis=1)
    return audio, sr


def float_to_wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_handler(engine):
    from fish_diffusion_tpu.extractors.feature import resample_linear
    from fish_diffusion_tpu.utils.audio import save_wav  # noqa: F401

    class Handler(BaseHTTPRequestHandler):
        def _cors(self):
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "POST, OPTIONS")
            self.send_header("Access-Control-Allow-Headers", "*")

        def do_OPTIONS(self):
            self.send_response(200)
            self._cors()
            self.end_headers()

        def do_POST(self):
            if self.path != "/voiceChangeModel":
                self.send_response(404)
                self.end_headers()
                return

            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            fields, files = parse_multipart(
                body, self.headers.get("Content-Type", "")
            )

            wav_data = files.get("sample") or next(iter(files.values()))
            audio, sr = wav_bytes_to_float(wav_data)

            pitch_change = float(fields.get("fPitchChange", 0))
            speaker = fields.get("sSpeakId", "0")
            out_sr = int(fields.get("sampleRate", sr))

            if sr != engine.sampling_rate:
                audio = resample_linear(audio, sr, engine.sampling_rate)

            out = engine.forward(
                audio, int(speaker) if str(speaker).isdigit() else 0,
                pitch_adjust=pitch_change,
            )

            if out_sr != engine.sampling_rate:
                out = resample_linear(out, engine.sampling_rate, out_sr)

            payload = float_to_wav_bytes(out, out_sr)
            self.send_response(200)
            self._cors()
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):
            print(f"[flask_api] {fmt % args}")

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--port", type=int, default=6842)
    args = parser.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "hifisinger_inference", Path(__file__).parent / "inference.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    engine = mod.HiFiSingerInference(args.config, args.checkpoint)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(engine))
    print(f"[flask_api] serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
