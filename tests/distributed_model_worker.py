"""Worker for the cross-process MODEL-STEP equivalence test (VERDICT r4
next #6): each of 2 processes owns one CPU device; together they run the
REAL tiny-RFN data-parallel train step (Trainer._train_step over a
2-device global mesh) with each process materializing only its local
batch shard. The parent compares loss/KL and the full updated param tree
against the single-process step on the same batch/key — upgrading the
round-3 psum smoke test to the test_multidevice_equivalence.py standard
across process boundaries (reference DataParallel semantics,
/root/reference/RFN/trainer.py:92-94).

Usage: python distributed_model_worker.py <port> <pid> <nproc> <outdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]

    from recurrent_flows_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc  # one CPU device per process

    from jax.sharding import Mesh

    from recurrent_flows_tpu.config import TrainConfig
    from recurrent_flows_tpu.data import MovingMNIST
    from recurrent_flows_tpu.models import RFN
    from recurrent_flows_tpu.parallel.mesh import data_sharding
    from recurrent_flows_tpu.training import Trainer
    from test_rfn import tiny_cfg

    n_frames, batch_size = 3, 8
    ds = MovingMNIST(seq_len=n_frames, image_size=16, digit_size=8,
                     num_digits=1)
    # the full deterministic batch — bit-identical on every process AND in
    # the parent (same CPU platform, same key)
    batch = np.asarray(ds.sample(jax.random.key(42), batch_size))

    mesh = Mesh(np.array(jax.devices()).reshape(nproc, 1), ("data", "model"))
    cfg = tiny_cfg()
    tcfg = TrainConfig(batch_size=batch_size, n_frames=n_frames,
                       beta_steps=10)
    tr = Trainer(RFN(cfg, remat=False), tcfg, ds,
                 os.path.join(outdir, f"w{pid}"), mesh=mesh).build(
                     run_ddi=False)

    # each process contributes ONLY its local slice of the global batch
    sl = distributed.process_local_batch_slice(batch_size)
    x = jax.make_array_from_process_local_data(
        data_sharding(mesh, batch.ndim), batch[sl])

    state, metrics = tr._train_step(
        tr.state, x, jnp.float32(1.0), jnp.float32(1e-3), jax.random.key(5))

    print(f"RESULT {pid} {float(metrics['loss']):.8f} "
          f"{float(metrics['kl']):.8f}", flush=True)
    if pid == 0:
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        np.savez(os.path.join(outdir, "params.npz"),
                 **{jax.tree_util.keystr(path): np.asarray(jax.device_get(v))
                    for path, v in flat})


if __name__ == "__main__":
    main()
