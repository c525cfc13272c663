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
