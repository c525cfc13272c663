#!/usr/bin/env python
"""Fetch the real MNIST IDX files into ./mnist_data (or --out DIR).

The reference obtains MNIST through torchvision
(reference data_generators/stochasticMovingMnist.py:30-36). This host has
zero network egress, so the digits cannot be downloaded here — run this
script once on any networked machine and copy the ~11 MB directory over;
`MovingMNIST(data_root=...)` picks the files up automatically and reports
`bank_kind == "mnist-idx"`.

Falls back through the known public mirrors and verifies MD5 checksums
(the same ones torchvision pins). Also accepts a Keras-style mnist.npz via
--from-npz and converts it to IDX.
"""

from __future__ import annotations

import argparse
import gzip
import hashlib
import os
import struct
import sys
import urllib.request

MIRRORS = [
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
    "http://yann.lecun.com/exdb/mnist/",
]

# filename -> md5 of the .gz (torchvision's pinned checksums)
FILES = {
    "train-images-idx3-ubyte.gz": "f68b3c2dcbeaaa9fbdd348bbdeb94873",
    "train-labels-idx1-ubyte.gz": "d53e105ee54ea40749a09fcbcd1e9432",
    "t10k-images-idx3-ubyte.gz": "9fb629c4189551a2d022fa330f9573f3",
    "t10k-labels-idx1-ubyte.gz": "ec29112dd5afa0611ce80d1b7f02629c",
}


def fetch(name: str, md5: str, out_dir: str) -> bool:
    dest = os.path.join(out_dir, name)
    if os.path.exists(dest):
        with open(dest, "rb") as f:
            if hashlib.md5(f.read()).hexdigest() == md5:
                print(f"{name}: already present, checksum ok")
                return True
    for mirror in MIRRORS:
        url = mirror + name
        try:
            print(f"{name}: fetching {url}")
            data = urllib.request.urlopen(url, timeout=60).read()
        except Exception as e:  # noqa: BLE001 - try next mirror
            print(f"  failed: {e}")
            continue
        got = hashlib.md5(data).hexdigest()
        if got != md5:
            print(f"  checksum mismatch ({got} != {md5}), trying next mirror")
            continue
        with open(dest, "wb") as f:
            f.write(data)
        print(f"  ok ({len(data)} bytes)")
        return True
    return False


def convert_npz(npz_path: str, out_dir: str) -> None:
    """Convert Keras mnist.npz (x_train/x_test uint8) to IDX image files."""
    import numpy as np

    data = np.load(npz_path)
    for split, stem in (("x_train", "train-images-idx3-ubyte"),
                        ("x_test", "t10k-images-idx3-ubyte")):
        arr = np.asarray(data[split], dtype=np.uint8)
        n, rows, cols = arr.shape
        path = os.path.join(out_dir, stem)
        with open(path, "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, rows, cols))
            f.write(arr.tobytes())
        print(f"wrote {path} ({n}x{rows}x{cols})")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="./mnist_data")
    p.add_argument("--from-npz", default=None,
                   help="convert an existing Keras mnist.npz instead of downloading")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.from_npz:
        convert_npz(args.from_npz, args.out)
        return 0
    ok = all(fetch(name, md5, args.out) for name, md5 in FILES.items())
    if not ok:
        print("FAILED: could not fetch all files from any mirror", file=sys.stderr)
        return 1
    # sanity: parse the train images header
    with gzip.open(os.path.join(args.out, "train-images-idx3-ubyte.gz"), "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
    assert (magic, rows, cols) == (2051, 28, 28) and n == 60000
    print(f"MNIST ready in {args.out} ({n} train images)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
