"""Build native frame-cache blobs from KTH/BAIR frame directories.

One-time PNG decode -> mmap blob; afterwards the C++ prefetcher serves
batches with zero Python in the steady-state path.

Usage:
  python scripts/build_framecache.py --dataset kth --data_root ./kth_data
  python scripts/build_framecache.py --dataset bair --data_root ./bair_robot_data/processed_data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_flows_tpu.data import KTH, PushDataset
from recurrent_flows_tpu.data.framecache import blob_from_loader, ensure_built


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["kth", "bair"], required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--max_videos", type=int, default=None)
    args = p.parse_args()
    assert ensure_built(), "g++ toolchain required"
    for split, train in (("train", True), ("test", False)):
        if args.dataset == "kth":
            loader = KTH(train=train, data_root=args.data_root, seq_len=1)
        else:
            loader = PushDataset(split=split, dataset_dir=args.data_root, seq_len=1)
        out = os.path.join(args.data_root, f"{args.dataset}_{split}.blob")
        blob_from_loader(loader, out, max_videos=args.max_videos)
        print("wrote", out)


if __name__ == "__main__":
    main()
