"""Realtime TCP streaming API.

Capability parity with the reference ``tools/diffusion/tcp_api.py``: raw
socket loop, 3-second float32 frames (frame_size = 3 * 4 * sample_rate),
silence gating, inference, echo converted frame back; per-frame wall time
printed.
"""

from __future__ import annotations

import argparse
import socket
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def make_frame_processor(engine, speakers, pitch_adjust: float = 0.0,
                         silence_db: float = -40.0):
    """float32 frame -> converted float32 frame of the same length;
    silent frames (RMS below ``silence_db``) return zeros without touching
    the model (reference tcp_api.py silence gating)."""

    def process(audio: np.ndarray) -> np.ndarray:
        rms_db = 20 * np.log10(np.sqrt(np.mean(audio**2)) + 1e-9)
        if rms_db < silence_db:
            return np.zeros_like(audio)
        out = engine.forward(audio, speakers, pitch_adjust=pitch_adjust)
        if len(out) < len(audio):
            out = np.pad(out, (0, len(audio) - len(out)))
        return out[: len(audio)].astype(np.float32)

    return process


def serve(sock, process, frame_samples: int, max_clients=None):
    """Accept loop: length-framed float32 in, converted float32 out."""
    frame_bytes = frame_samples * 4
    served = 0
    while max_clients is None or served < max_clients:
        conn, addr = sock.accept()
        served += 1
        print(f"[tcp_api] client {addr}")
        buffer = b""
        try:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                buffer += data

                while len(buffer) >= frame_bytes:
                    chunk, buffer = buffer[:frame_bytes], buffer[frame_bytes:]
                    audio = np.frombuffer(chunk, np.float32).copy()
                    t0 = time.time()
                    out = process(audio)
                    conn.sendall(out.astype(np.float32).tobytes())
                    print(f"[tcp_api] frame in {time.time() - t0:.3f}s")
        finally:
            conn.close()
            print(f"[tcp_api] client {addr} closed")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=10086)
    parser.add_argument("--speaker", default="0")
    parser.add_argument("--pitch-adjust", type=float, default=0)
    parser.add_argument("--seconds", type=float, default=3.0)
    parser.add_argument("--silence-db", type=float, default=-40.0)
    args = parser.parse_args()

    from fish_diffusion_tpu.inference import SVCInference

    engine = SVCInference(args.config, args.checkpoint)
    speakers = engine.parse_speaker(args.speaker)
    frame_samples = int(args.seconds * engine.sampling_rate)

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind((args.host, args.port))
    sock.listen(1)
    print(f"[tcp_api] listening on {args.host}:{args.port}, "
          f"frame={frame_samples} samples")

    process = make_frame_processor(
        engine, speakers, args.pitch_adjust, args.silence_db
    )
    serve(sock, process, frame_samples)


if __name__ == "__main__":
    main()
