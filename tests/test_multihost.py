"""Unit tests for the multi-host helpers (parallel/multihost.py).

This box is single-host, so what IS testable here is the contract the
multi-host path relies on: the single-process no-op, the logged (not
swallowed) failure reason, and per-host shard assembly producing
correctly shaped/valued global arrays on a 1-process mesh (where
process_count == 1 makes local == global).
"""

import logging

import numpy as np

import jax

from lsps_tpu.parallel import make_mesh
from lsps_tpu.parallel.multihost import (global_batch_from_host_shards,
                                         initialize)


def test_initialize_single_process_noop():
    ok, reason = initialize(num_processes=1)
    assert ok is False
    assert reason == "single-process"
    ok, reason = initialize(num_processes=0)
    assert not ok


def test_initialize_failure_is_logged_with_reason(caplog):
    # multi-process without a coordinator address / process id is a
    # fast argument error inside jax.distributed.initialize — it must
    # surface as a logged reason, not a silent False (no network wait:
    # a bogus-but-valid coordinator would block on connect for minutes)
    with caplog.at_level(logging.WARNING,
                         logger="lsps_tpu.parallel.multihost"):
        ok, reason = initialize(coordinator_address=None,
                                num_processes=2, process_id=None)
    assert ok is False
    assert reason and reason != "single-process"
    assert any("multihost initialize failed" in r.message
               for r in caplog.records)


def test_global_batch_from_host_shards_single_process():
    mesh = make_mesh(n_data=len(jax.devices()))
    imgs = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    lbls = np.arange(8, dtype=np.float32)

    g_imgs, g_lbls = global_batch_from_host_shards(mesh, [imgs, lbls])
    # process_count == 1: global shape equals local shape, values intact
    assert g_imgs.shape == (8 * jax.process_count(), 4)
    assert g_lbls.shape == (8 * jax.process_count(),)
    np.testing.assert_array_equal(np.asarray(g_imgs), imgs)
    np.testing.assert_array_equal(np.asarray(g_lbls), lbls)
    # sharded over the data axis of the mesh
    assert g_imgs.sharding.mesh.shape["data"] == mesh.shape["data"]

    single = global_batch_from_host_shards(mesh, [imgs])
    assert not isinstance(single, tuple)
    assert single.shape == imgs.shape
