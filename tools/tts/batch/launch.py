"""Multi-worker batch launcher (parity with reference
``tools/tts/batch/launch.py``: SLURM-style env launcher that shards a
command over workers with rank/world-size environment)."""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--world-size", type=int, default=1)
    parser.add_argument("command", nargs=argparse.REMAINDER,
                        help="command to launch per worker (RANK/WORLD_SIZE env set)")
    args = parser.parse_args()

    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    assert cmd, "no command given"

    procs = []
    for rank in range(args.world_size):
        env = dict(os.environ)
        env["RANK"] = str(rank)
        env["WORLD_SIZE"] = str(args.world_size)
        procs.append(subprocess.Popen(cmd, env=env))
        print(f"[launch] worker {rank}/{args.world_size}: pid {procs[-1].pid}")

    codes = [p.wait() for p in procs]
    if any(codes):
        print(f"[launch] failures: {codes}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
