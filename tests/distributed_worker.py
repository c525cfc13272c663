"""Worker process for the REAL multi-process jax.distributed test.

Launched (2x) by tests/test_distributed.py::test_two_process_psum_train_step.
Each process owns one CPU device; together they form a 2-device global
mesh. Runs one data-parallel train step on a tiny linear model where each
process contributes its OWN batch shard, and prints the psum'd gradient /
updated params so the parent can assert both processes agree (i.e. the
gradient all-reduce actually crossed process boundaries).

Usage: python distributed_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from recurrent_flows_tpu.parallel import distributed  # noqa: E402


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    devices = jax.devices()
    assert len(devices) == nproc, devices  # one CPU device per process

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(devices), ("data",))

    # deterministic global batch; each process materializes only its slice
    global_batch = 8
    rs = np.random.RandomState(0)
    x_all = rs.randn(global_batch, 4).astype(np.float32)
    y_all = rs.randn(global_batch, 1).astype(np.float32)
    sl = distributed.process_local_batch_slice(global_batch)
    assert (sl.stop - sl.start) == global_batch // nproc

    sharding = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(sharding, x_all[sl])
    y = jax.make_array_from_process_local_data(sharding, y_all[sl])

    w0 = jnp.zeros((4, 1))

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, g, w - 0.1 * g

    loss, g, w1 = step(w0, x, y)
    # the mean-over-global-batch gradient requires a cross-process psum,
    # inserted by jit from the sharding — this is the real collective
    g_local = np.asarray(jax.device_get(g))
    w1_local = np.asarray(jax.device_get(w1))

    # oracle: single-process full-batch gradient
    g_ref = (2.0 / global_batch) * x_all.T @ (x_all @ np.zeros((4, 1)) - y_all)
    np.testing.assert_allclose(g_local, g_ref, rtol=1e-5, atol=1e-6)

    print("RESULT", pid, float(loss),
          ",".join(f"{v:.8f}" for v in g_local.ravel()),
          ",".join(f"{v:.8f}" for v in w1_local.ravel()), flush=True)


if __name__ == "__main__":
    main()
