"""BASELINE config #5, end-to-end at shape (round-3 VERDICT item 8):
8192 envs per generation sharded over the 8-device mesh feeding a PGPE
loop, with a mid-run checkpoint whose resume bitwise-replays the
uninterrupted run.

Config #5 (BASELINE.md): "8192 envs sharded over 2+ hosts feeding an
ES-style learning loop" — here the population axis shards over the
8-virtual-device CPU mesh (popsize 16 x envs_per_eval 512 = 8192 envs per
generation, 2 members / 1024 envs per device); the real-pod invocation is
the same code after die_tpu.parallel.distributed.initialize()
(tools/pod_bench.sh).  Reference loop being modeled:
/root/reference/examples/learning_agents.py:112-152.
"""
import glob

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.learned import LatticeTrainConfig, train_lattice

CFG = LatticeTrainConfig(field_size=(16, 16), epochs=3, epoch_iters=3,
                         popsize=16, envs_per_eval=512, seed=11)


@pytest.mark.slow
def test_config5_shape_sharded_training_with_resume(tmp_path):
    assert CFG.popsize * CFG.envs_per_eval == 8192  # the config-#5 shape
    devices = jax.devices()
    assert len(devices) >= 8, "conftest provides 8 virtual devices"
    mesh = Mesh(np.array(devices[:8]), ("pop",))
    dyn = FastDynamics(food_infinite=True)

    # uninterrupted reference, sharded at full shape
    best_ref, es_ref, hist_ref = train_lattice(dyn, CFG, mesh=mesh)
    assert len(hist_ref) == 3

    # interrupted at epoch 2 (checkpoint), resumed to completion
    ckdir = str(tmp_path / "ck")
    train_lattice(dyn, CFG._replace(epochs=2), mesh=mesh,
                  checkpoint_dir=ckdir, checkpoint_every=2)
    ck = sorted(glob.glob(ckdir + "/es_*.npz"))[-1]
    best_res, es_res, hist_res = train_lattice(dyn, CFG, mesh=mesh,
                                               resume_from=ck, start_epoch=2)

    # bitwise replay: the resumed run reproduces the uninterrupted stream
    assert hist_res == hist_ref[2:]
    assert np.array_equal(np.asarray(es_ref.center), np.asarray(es_res.center))
    assert np.array_equal(np.asarray(es_ref.stdev), np.asarray(es_res.stdev))
    assert np.array_equal(np.asarray(best_ref), np.asarray(best_res))

    # and the sharded full-shape run equals the unsharded one (the mesh is
    # layout, not semantics) — one epoch is enough to pin it at this scale
    one = CFG._replace(epochs=1)
    _, es_a, hist_a = train_lattice(dyn, one, mesh=mesh)
    _, es_b, hist_b = train_lattice(dyn, one)
    assert hist_a == hist_b
    assert np.array_equal(np.asarray(es_a.center), np.asarray(es_b.center))
