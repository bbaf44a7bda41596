"""Zero-dependency browser UI for SVC inference.

Same controls as the reference Gradio app (``tools/diffusion/gradio_ui.py``:
audio in/out, speaker dropdown or id, pitch adjust, sampler-interval slider
with the "faster generation / better quality" hint), served from the stdlib
``http.server`` so it runs in environments without gradio. ``gradio_ui.py``
remains the gradio-native variant for environments that have the package.

Endpoints:
  GET  /          one-page UI (vanilla HTML/JS, no CDN assets)
  GET  /api/info  {"speakers": [...], "sampling_rate": N}
  POST /convert   multipart: sample=<wav>, sSpeakId, fPitchChange,
                  samplerInterval -> audio/wav
"""

from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tools.diffusion.flask_api import (  # noqa: E402
    float_to_wav_bytes,
    parse_multipart,
    wav_bytes_to_float,
)

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Fish Diffusion (TPU) — SVC</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:640px;margin:2rem auto;padding:0 1rem}
 fieldset{border:1px solid #ccc;border-radius:8px;margin-bottom:1rem}
 label{display:block;margin:.6rem 0 .2rem}
 output{font-variant-numeric:tabular-nums;margin-left:.5rem}
 button{padding:.5rem 1.5rem;font-size:1rem}
 #status{margin-left:1rem;color:#666}
</style></head><body>
<h1>Fish Diffusion (TPU) — SVC</h1>
<fieldset><legend>Input</legend>
 <input type="file" id="audio" accept="audio/wav,.wav">
</fieldset>
<fieldset><legend>Settings</legend>
 <label for="speaker">Speaker</label><span id="speaker-slot"></span>
 <label for="pitch">Pitch Adjust (semitones)
   <output id="pitch-val">0</output></label>
 <input type="range" id="pitch" min="-24" max="24" step="1" value="0">
 <label for="interval">Sampler Interval
   (&#11014;&#65039; Faster Generation, &#11015;&#65039; Better Quality)
   <output id="interval-val">10</output></label>
 <input type="range" id="interval" min="1" max="50" step="1" value="10">
</fieldset>
<button id="convert">Convert</button><span id="status"></span>
<h2>Output</h2><audio id="out" controls></audio>
<script>
const $ = id => document.getElementById(id);
for (const k of ["pitch","interval"])
  $(k).oninput = () => $(k+"-val").textContent = $(k).value;
fetch("/api/info").then(r=>r.json()).then(info=>{
  const slot = $("speaker-slot");
  if (info.speakers.length) {
    const sel = document.createElement("select"); sel.id = "speaker";
    for (const s of info.speakers) {
      const o = document.createElement("option"); o.textContent = s;
      sel.appendChild(o);
    }
    slot.appendChild(sel);
  } else {
    const inp = document.createElement("input");
    inp.id = "speaker"; inp.value = "0"; slot.appendChild(inp);
  }
});
$("convert").onclick = async () => {
  const f = $("audio").files[0];
  if (!f) { $("status").textContent = "pick a wav file first"; return; }
  $("status").textContent = "converting…";
  const form = new FormData();
  form.append("sample", f);
  form.append("sSpeakId", $("speaker").value);
  form.append("fPitchChange", $("pitch").value);
  form.append("samplerInterval", $("interval").value);
  const resp = await fetch("/convert", {method:"POST", body:form});
  if (!resp.ok) { $("status").textContent = "error: " + resp.status; return; }
  $("out").src = URL.createObjectURL(await resp.blob());
  $("status").textContent = "done";
};
</script></body></html>"""


def make_handler(engine, speaker_mapping=None):
    from fish_diffusion_tpu.extractors.feature import resample_linear

    speakers = list((speaker_mapping or {}).keys())

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, ctype, payload: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, "text/html; charset=utf-8", PAGE.encode())
            elif self.path == "/api/info":
                info = {
                    "speakers": speakers,
                    "sampling_rate": engine.sampling_rate,
                }
                self._send(200, "application/json", json.dumps(info).encode())
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            if self.path != "/convert":
                self._send(404, "text/plain", b"not found")
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            fields, files = parse_multipart(
                body, self.headers.get("Content-Type", "")
            )
            wav_data = files.get("sample") or next(iter(files.values()))
            audio, sr = wav_bytes_to_float(wav_data)
            if sr != engine.sampling_rate:
                audio = resample_linear(audio, sr, engine.sampling_rate)

            speakers_arg = engine.parse_speaker(fields.get("sSpeakId", "0"))
            out = engine.forward(
                audio,
                speakers_arg,
                pitch_adjust=float(fields.get("fPitchChange", 0)),
                sampler_interval=int(fields.get("samplerInterval", 10)),
            )
            self._send(
                200, "audio/wav", float_to_wav_bytes(out, engine.sampling_rate)
            )

        def log_message(self, fmt, *args):
            print(f"[web_ui] {fmt % args}")

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()

    from fish_diffusion_tpu.inference import SVCInference

    engine = SVCInference(args.config, args.checkpoint)
    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port),
        make_handler(engine, engine.config.get("speaker_mapping")),
    )
    print(f"[web_ui] serving on http://0.0.0.0:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
