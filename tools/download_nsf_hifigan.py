"""NSF-HiFiGAN checkpoint download + conversion helper (parity with
reference ``tools/download_nsf_hifigan.py``: release zip fetch with license
gate).

This environment has no network egress; the tool documents the manual path
and performs the conversion step when the torch checkpoint is present.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import zipfile
from pathlib import Path

LICENSE = """
The NSF-HiFiGAN checkpoint is released by the OpenVPI team under the
CC-BY-NC-SA 4.0 license. By downloading it you agree to the license terms.
"""

URL = "https://github.com/openvpi/vocoders/releases/download/nsf-hifigan-v1/nsf_hifigan_20221211.zip"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target", default="checkpoints/nsf_hifigan")
    parser.add_argument("--agree-license", action="store_true")
    parser.add_argument("--zip", default=None,
                        help="path to a pre-downloaded release zip")
    args = parser.parse_args()

    if not args.agree_license:
        print(LICENSE)
        resp = input("Agree to the license? [y/N] ")
        if resp.strip().lower() != "y":
            sys.exit(1)

    target = Path(args.target)
    target.mkdir(parents=True, exist_ok=True)

    zip_path = Path(args.zip) if args.zip else target / "nsf_hifigan.zip"
    if not zip_path.exists():
        try:
            import urllib.request

            print(f"downloading {URL} ...")
            urllib.request.urlretrieve(URL, zip_path)
        except Exception as e:
            print(f"download failed ({e}). Download manually:\n  {URL}\n"
                  f"then rerun with --zip <path>.")
            sys.exit(1)

    with zipfile.ZipFile(zip_path) as z:
        z.extractall(target)
    print(f"extracted to {target}")

    # convert the torch checkpoint to flax params
    model_file = next(target.rglob("model"), None)
    if model_file:
        subprocess.run(
            [
                sys.executable,
                str(Path(__file__).parent / "nsf_hifigan" / "convert_checkpoint.py"),
                "--input", str(model_file),
                "--output", str(target / "model.pkl"),
            ],
            check=True,
        )
        print(f"converted -> {target / 'model.pkl'}")


if __name__ == "__main__":
    main()
