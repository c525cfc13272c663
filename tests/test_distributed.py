"""Unit tests for multi-host scaffolding (parallel/distributed.py).

No pod here: process_count/process_index are mocked (VERDICT r1 item #9) to
check the batch-slicing arithmetic each host would apply.
"""

from unittest import mock

import pytest

from recurrent_flows_tpu.parallel import distributed


@pytest.mark.fast
@pytest.mark.parametrize("n_proc", [1, 2, 4])
def test_process_local_batch_slice_partitions(n_proc):
    global_batch = 16
    slices = []
    with mock.patch.object(distributed.jax, "process_count", return_value=n_proc):
        for pid in range(n_proc):
            with mock.patch.object(
                distributed.jax, "process_index", return_value=pid
            ):
                slices.append(distributed.process_local_batch_slice(global_batch))
    # slices tile [0, global_batch) exactly, in order, equally sized
    covered = []
    for s in slices:
        assert (s.stop - s.start) == global_batch // n_proc
        covered.extend(range(s.start, s.stop))
    assert covered == list(range(global_batch))


@pytest.mark.fast
def test_is_primary_only_on_process_zero():
    with mock.patch.object(distributed.jax, "process_index", return_value=0):
        assert distributed.is_primary()
    with mock.patch.object(distributed.jax, "process_index", return_value=3):
        assert not distributed.is_primary()


@pytest.mark.fast
def test_initialize_forwards_coordinator_args():
    with mock.patch.object(distributed.jax.distributed, "initialize") as init:
        distributed.initialize("host:1234", num_processes=4, process_id=1)
        init.assert_called_once_with(
            coordinator_address="host:1234", num_processes=4, process_id=1
        )
        init.reset_mock()
        distributed.initialize()
        init.assert_called_once_with()


@pytest.mark.slow
def test_two_process_psum_train_step(tmp_path):
    """REAL multi-process run (VERDICT r2 item #4): two CPU subprocesses
    form a jax.distributed cluster via a local coordinator, run one
    data-parallel train step where each process holds its own batch shard,
    and must agree on the psum'd gradient (verified against the
    single-process full-batch oracle inside each worker)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out
        outs.append(lines[0].split()[2:])  # loss, grad, w1
    # both processes observed the SAME global loss/gradient/updated params
    assert outs[0] == outs[1], outs


@pytest.mark.slow
def test_two_process_model_step_matches_single_process(tmp_path):
    """Cross-process MODEL equivalence (VERDICT r4 next #6): the 2-process
    data-parallel tiny-RFN train step must EQUAL the 1-process step on the
    same batch/key — loss, KL, and every updated param tensor — mirroring
    tests/test_multidevice_equivalence.py across process boundaries."""
    import os
    import socket
    import subprocess
    import sys

    import numpy as np

    import jax
    import jax.numpy as jnp

    # ---- single-process reference (in THIS pytest process) ----
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rfn import tiny_cfg

    from recurrent_flows_tpu.config import TrainConfig
    from recurrent_flows_tpu.data import MovingMNIST
    from recurrent_flows_tpu.models import RFN
    from recurrent_flows_tpu.training import Trainer

    n_frames, batch_size = 3, 8
    ds = MovingMNIST(seq_len=n_frames, image_size=16, digit_size=8,
                     num_digits=1)
    batch = np.asarray(ds.sample(jax.random.key(42), batch_size))
    tcfg = TrainConfig(batch_size=batch_size, n_frames=n_frames,
                       beta_steps=10)
    tr = Trainer(RFN(tiny_cfg(), remat=False), tcfg, ds,
                 str(tmp_path / "single")).build(run_ddi=False)
    ref_state, ref_metrics = tr._train_step(
        tr.state, jnp.asarray(batch), jnp.float32(1.0), jnp.float32(1e-3),
        jax.random.key(5))

    # ---- 2-process cluster ----
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_model_worker.py")
    outdir = str(tmp_path / "cluster")
    os.makedirs(outdir)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", outdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out
        outs.append(lines[0].split())

    # both processes saw the same global loss/KL, equal to the reference
    for pid, (_, _, loss, kl) in enumerate(outs):
        np.testing.assert_allclose(float(loss), float(ref_metrics["loss"]),
                                   rtol=1e-5,
                                   err_msg=f"worker {pid} loss != single")
        np.testing.assert_allclose(float(kl), float(ref_metrics["kl"]),
                                   rtol=1e-5,
                                   err_msg=f"worker {pid} kl != single")

    # the updated param tree from the cluster == the single-process tree
    got = np.load(os.path.join(outdir, "params.npz"))
    flat = jax.tree_util.tree_flatten_with_path(ref_state.params)[0]
    assert len(got.files) == len(flat)
    for path, want in flat:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            got[key], np.asarray(want), rtol=5e-5, atol=1e-6,
            err_msg=f"cross-process param mismatch at {key}")
