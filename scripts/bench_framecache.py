"""Feed-rate benchmark: native framecache -> (optionally) device.

Verdict r3 #6: the framecache is unit-tested but nobody showed it
sustains the rate the production train step consumes
(~9.5 steps/s x B30 x T10 = ~2,850 frames/s, BENCH_DETAILS.json
prod_loss_grad). This builds a synthetic KTH-size blob (64x64x1 uint8),
then measures, per stage:

  ring_u8      C++ prefetch ring -> pinned uint8 numpy (no conversion)
  host_f32     the exact Trainer path: ring + astype(f32)/255
  device_f32   host_f32 + jax.device_put + block (adds PCIe/link)
  device_u8    uint8 device_put + on-device convert (the cheaper wire
               format: 4x less link traffic; candidate default if the
               f32 path can't keep margin)

and prints one JSON line per stage with frames/s and the margin vs the
prod consumer. Reference match: the torch DataLoader worker pool that
feeds the reference trainer (RFN/trainer.py:155-161) — here the feeder
is the C++ ring, so the margin must come from one process.

Usage: python scripts/bench_framecache.py [--device] [--videos 256]
       [--frames 120] [--batches 200] [--consumer-fps 2850]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recurrent_flows_tpu.data import framecache as fcache

B, T, H, W, C = 30, 10, 64, 64, 1


def build_synth_blob(path: str, n_videos: int, n_frames: int) -> str:
    """KTH-shaped synthetic content (moving gradient; incompressible
    enough that memcpy can't be elided, cheap to generate)."""
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    def video(i):
        phase = rng.uniform(0, 2 * np.pi, size=(2,))
        ts = np.arange(n_frames, dtype=np.float32)[:, None, None]
        img = 127.5 * (1 + np.sin(0.1 * xx + 0.3 * ts + phase[0])
                       * np.cos(0.13 * yy + 0.2 * ts + phase[1]))
        return img.astype(np.uint8)[..., None]

    fcache.build_blob((video(i) for i in range(n_videos)), path)
    return path


def rate(fn, n_batches: int, warmup: int = 10):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n_batches):
        fn()
    dt = time.perf_counter() - t0
    return n_batches / dt * B * T, dt / n_batches * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="include device_put stages (needs the TPU free)")
    ap.add_argument("--videos", type=int, default=256)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--batches", type=int, default=200)
    ap.add_argument("--consumer-fps", type=float, default=2850.0)
    ap.add_argument("--blob", default="/tmp/kth_synth_bench.blob")
    args = ap.parse_args()

    assert fcache.is_available(), "native framecache did not build"
    blob = build_synth_blob(args.blob, args.videos, args.frames)
    size_mb = os.path.getsize(blob) / 1e6

    def emit(stage, fps, ms):
        print(json.dumps(dict(
            stage=stage, frames_per_s=round(fps, 0), ms_per_batch=round(ms, 3),
            margin_vs_consumer=round(fps / args.consumer_fps, 1),
        )), flush=True)

    fc = fcache.FrameCache(blob, seq_len=T, batch_size=B, n_buffers=8)
    fc.start_prefetch()
    print(json.dumps(dict(stage="setup", blob_mb=round(size_mb, 1),
                          videos=args.videos, consumer_fps=args.consumer_fps)),
          flush=True)

    buf = fc._buf
    lib, h = fc._lib, fc._h
    import ctypes
    p8 = ctypes.POINTER(ctypes.c_uint8)
    emit("ring_u8", *rate(
        lambda: lib.fc_next_batch(h, buf.ctypes.data_as(p8)), args.batches))
    emit("host_f32", *rate(fc.sample_numpy, args.batches))

    if args.device:
        # Slope method (docs/PERF.md round-3 correction): on the axon
        # remote backend block_until_ready is a no-op, so per-call
        # timing measures enqueue rate. Instead chain k transfers with
        # a device-side scalar dependency on EVERY transferred batch,
        # value-fetch once, and take the slope over k — the link
        # constant (RTT, dispatch floor) cancels.
        import time

        import jax
        import jax.numpy as jnp

        dev = jax.devices()[0]
        to_f32 = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)
        peek = jax.jit(lambda s, x: s + x.reshape(-1)[0])

        def chain(k, mode):
            s = jnp.zeros((), jnp.float32)
            for _ in range(k):
                if mode == "f32":
                    x = jax.device_put(fc.sample_numpy(), dev)
                else:
                    lib.fc_next_batch(h, buf.ctypes.data_as(p8))
                    x = to_f32(jax.device_put(buf, dev))
                s = peek(s, x)
            return float(jax.device_get(s))

        def slope(mode, k1=8, k2=32, reps=3):
            chain(3, mode)  # warm compile + transfer path
            per = []
            for _ in range(reps):
                t0 = time.perf_counter(); chain(k1, mode)
                t1 = time.perf_counter(); chain(k2, mode)
                t2 = time.perf_counter()
                per.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
            ms = min(per) * 1e3  # min over reps: least-interference
            return (B * T) / (ms / 1e3), ms

        emit("device_f32_slope", *slope("f32"))
        emit("device_u8wire_slope", *slope("u8"))
    fc.close()


if __name__ == "__main__":
    main()
