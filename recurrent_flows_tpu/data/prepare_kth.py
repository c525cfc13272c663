"""KTH download + frame-extraction prep (replaces the reference's
download_kth.sh + convert_kth.lua Torch7/ffmpeg pipeline).

Reference data_generators/download_kth.sh:1-21 wgets Denton's preprocessed
tarball (or the raw KTH zips); convert_kth.lua:1-30 extracts 64x64 PNG
frames with ffmpeg. This script does the same with stdlib + ffmpeg, and is
a no-op on hosts without network — point --data_root at an existing
directory instead.

Usage:
  python -m recurrent_flows_tpu.data.prepare_kth --data_root ./kth_data \
      [--image_size 64]
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

CLASSES = ("boxing", "handclapping", "handwaving", "jogging", "running", "walking")
_PROCESSED_URL = "http://www.cs.nyu.edu/~denton/datasets/kth.tar.gz"
_RAW_URL = "http://www.nada.kth.se/cvap/actions/{cls}.zip"


def download_processed(data_root: str) -> bool:
    tar = os.path.join(data_root, "kth.tar.gz")
    try:
        subprocess.run(["wget", "-q", _PROCESSED_URL, "-O", tar], check=True)
        subprocess.run(["tar", "-xzf", tar, "-C", data_root], check=True)
        return True
    except Exception as e:  # zero-egress hosts
        print(f"download failed ({e}); place frames under "
              f"{data_root}/processed/<class>/<video>/ manually", file=sys.stderr)
        return False


def extract_frames(data_root: str, image_size: int = 64) -> None:
    """ffmpeg raw .avi -> <root>/processed/<class>/<video>/image-NNN.png."""
    for cls in CLASSES:
        for avi in glob.glob(os.path.join(data_root, "raw", cls, "*.avi")):
            name = os.path.splitext(os.path.basename(avi))[0]
            out_dir = os.path.join(data_root, "processed", cls, name)
            os.makedirs(out_dir, exist_ok=True)
            subprocess.run(
                [
                    "ffmpeg", "-v", "error", "-i", avi,
                    "-vf", f"scale={image_size}:{image_size}",
                    os.path.join(out_dir, "image-%03d.png"),
                ],
                check=True,
            )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./kth_data")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--from_raw", action="store_true",
                   help="extract frames from raw .avi files instead of "
                        "downloading the preprocessed tarball")
    args = p.parse_args()
    os.makedirs(args.data_root, exist_ok=True)
    if args.from_raw:
        extract_frames(args.data_root, args.image_size)
    else:
        download_processed(args.data_root)


if __name__ == "__main__":
    main()
