"""True multi-process distributed test (SURVEY §4e): a 2-process CPU cluster
runs an env-sharded fast-engine rollout; per-env trajectories must be
bitwise identical to a single-process run."""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax
from die_tpu.fast.rollout import fast_rollout

WORKER = os.path.join(os.path.dirname(__file__), "helpers",
                      "mp_rollout_worker.py")
SIZE = (16, 16)
B = 4
STEPS = 5


def _run_cluster(worker, nproc, port, env):
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(nproc), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    return outs


@pytest.mark.slow
@pytest.mark.parametrize("nproc,port", [(2, 23789), (4, 23797)])
def test_multi_process_rollout_matches_single(nproc, port):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # workers manage their own platform; keep the virtual-device flag out so
    # each process exposes exactly one CPU device
    outs = _run_cluster(WORKER, nproc, port, env)

    rewards_mp = None
    host_keys = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("REWARDS"):
                vals = np.array([float(v) for v in line.split()[1:]],
                                np.float32).reshape(B, STEPS)
                if rewards_mp is None:
                    rewards_mp = vals
                else:
                    assert np.array_equal(rewards_mp, vals)
            elif line.startswith("LOCALKEYS"):
                parts = line.split()
                host_keys[int(parts[1])] = set(parts[2:])
    assert rewards_mp is not None

    # per-host PRNG stream disjointness: every host materialized a distinct,
    # non-overlapping set of env keys, matching the global derivation
    assert len(host_keys) == nproc
    allk = [k for ks in host_keys.values() for k in ks]
    assert len(allk) == len(set(allk)) == B
    import jax.random as _jr
    expected = {f"{int(k[0])}:{int(k[1])}" for k in
                (np.asarray(_jr.fold_in(_jr.PRNGKey(1), b))
                 for b in range(B))}
    assert set(allk) == expected

    # single-process reference
    dyn = FastDynamics()
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[fast_init_jax(jr.fold_in(jr.PRNGKey(0), b), SIZE, dyn)
          for b in range(B)])
    keys = jnp.stack([jr.fold_in(jr.PRNGKey(1), b) for b in range(B)])
    _, rewards, _ = jax.jit(jax.vmap(
        lambda s, k: fast_rollout(dyn, s, k, STEPS)))(states, keys)
    # fp32 printed with 6 decimals — compare at print precision
    assert np.allclose(rewards_mp, np.asarray(rewards), atol=5e-5)


ES_WORKER = os.path.join(os.path.dirname(__file__), "helpers",
                         "mp_es_worker.py")


@pytest.mark.slow
def test_two_process_es_training_matches_single():
    """Population-sharded ES training over a REAL 2-process cluster (the
    learning loop of SURVEY §5.8: fitness evaluation data-parallel across
    hosts): history and final ES center must be bitwise identical to the
    unsharded single-process run."""
    from die_tpu.fast.learned import LatticeTrainConfig, train_lattice

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # bit-exactness flags, but not the 8-virtual-device flag
    env["XLA_FLAGS"] = ("--xla_cpu_max_isa=AVX "
                        "--xla_disable_hlo_passes=algsimp")
    procs = [subprocess.Popen(
        [sys.executable, ES_WORKER, str(pid), "2", "23793"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    hists, digests, bests = set(), set(), set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("HISTORY"):
                hists.add(line)
            elif line.startswith("CENTER_DIGEST"):
                digests.add(line)
            elif line.startswith("BEST"):
                bests.add(line)
    assert len(hists) == 1 and len(digests) == 1 and len(bests) == 1

    # single-process unsharded reference (same config/seed as the worker)
    dyn = FastDynamics(food_infinite=True)
    cfg = LatticeTrainConfig(field_size=(16, 16), epochs=3, epoch_iters=4,
                             popsize=8, envs_per_eval=1, seed=3)
    best_ref, es_ref, hist_ref = train_lattice(dyn, cfg)
    assert hists.pop().split()[1:] == [
        f"{h['best']:.6f}" for h in hist_ref]
    center_bits = np.asarray(es_ref.center, np.float32).view(np.uint32)
    with np.errstate(over="ignore"):
        digest_ref = int(np.add.reduce(center_bits.reshape(-1),
                                       dtype=np.uint32))
    assert digests.pop() == f"CENTER_DIGEST {digest_ref}"
    assert bests.pop().split()[1:] == [
        f"{v:.6f}" for v in np.asarray(best_ref).reshape(-1)]


SPATIAL_WORKER = os.path.join(os.path.dirname(__file__), "helpers",
                              "mp_spatial_worker.py")


@pytest.mark.slow
@pytest.mark.parametrize("nproc,port", [(2, 23791), (4, 23799)])
def test_multi_process_spatial_rollout_matches_single(nproc, port):
    """Field rows sharded across a REAL multi-process cluster (halo exchange
    crosses the process boundaries; wave flow active): final-state digests
    must be bitwise identical to the single-process unsharded rollout."""
    from die_tpu.core.config import FlowConfig
    from die_tpu.core.rng import np_key
    from die_tpu.fast.init import fast_init_np

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # keep the bit-exactness flags (FMA contraction would break the wave
    # sincos parity) but NOT the 8-virtual-device flag
    env["XLA_FLAGS"] = ("--xla_cpu_max_isa=AVX "
                        "--xla_disable_hlo_passes=algsimp")
    outs = _run_cluster(SPATIAL_WORKER, nproc, port, env)

    digests, nums_mp = set(), None
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DIGEST"):
                digests.add(line)
            if line.startswith("NUMS"):
                nums_mp = [int(v) for v in line.split()[1:]]
    assert len(digests) == 1, digests  # both processes agree

    # single-process unsharded reference with identical init/keys
    dyn = FastDynamics(flow=FlowConfig(kind="wave"))
    full = fast_init_np(np_key(3), (32, 32), dyn)
    state = jax.tree.map(jnp.asarray, full)
    out_ref, _, nums_ref = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(9), 4))(state)
    assert nums_mp == [int(v) for v in np.asarray(nums_ref)]

    def digest(chem):
        bits = np.asarray(chem).view(np.uint32)
        with np.errstate(over="ignore"):
            return int(np.add.reduce(bits.reshape(-1), dtype=np.uint32))

    line = digests.pop().split()
    assert float(line[1]) == float(np.asarray(jnp.sum(out_ref.occ)))
    assert int(line[2]) == digest(out_ref.chem)
    assert int(line[3]) == digest(out_ref.env_food)
    assert int(line[4]) == digest(out_ref.agent_food)


BANDED_WORKER = os.path.join(os.path.dirname(__file__), "helpers",
                             "mp_banded_worker.py")


@pytest.mark.slow
def test_two_process_banded_kernel_under_mesh():
    """The banded Pallas kernel under a process-spanning mesh (round-3
    pod-readiness): each process's device runs the banded kernel on its env
    shard inside ONE shard_map program with a cross-process psum of the
    rewards — the realistic large-field pod deployment.  Per-env final
    states must be bitwise identical to single-process banded runs, and the
    psum'd rewards must equal the per-env sums."""
    import jax.random as jr_

    from die_tpu.fast.pallas_step import pallas_banded_rollout

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = ("--xla_cpu_max_isa=AVX "
                        "--xla_disable_hlo_passes=algsimp")
    outs = _run_cluster(BANDED_WORKER, 2, 23795, env)

    env_digests, grewards, nums = {}, set(), {}
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("ENVDIGEST"):
                parts = line.split()
                env_digests[int(parts[1])] = parts[2:]
            elif line.startswith("GREWARDS"):
                grewards.add(line)
            elif line.startswith("NUMS"):
                nums[i] = [int(v) for v in line.split()[1:]]
    assert len(env_digests) == 2
    assert len(grewards) == 1  # both processes agree on the global psum

    def digest(x):
        bits = np.asarray(x).view(np.uint32)
        with np.errstate(over="ignore"):
            return int(np.add.reduce(bits.reshape(-1), dtype=np.uint32))

    dyn = FastDynamics(agents_die=True)
    total = None
    for pid in range(2):
        st = fast_init_jax(jr_.fold_in(jr_.PRNGKey(0), pid), (32, 128), dyn)
        ref, rew, ref_nums = jax.jit(lambda s, k: pallas_banded_rollout(
            dyn, s, k, 4, num_bands=2, interpret=True))(
            st, jr_.fold_in(jr_.PRNGKey(1), pid))
        got = env_digests[pid]
        assert float(got[0]) == float(np.asarray(jnp.sum(ref.occ)))
        assert int(got[1]) == digest(ref.chem)
        assert int(got[2]) == digest(ref.agent_food)
        assert nums[pid] == [int(v) for v in np.asarray(ref_nums)]
        total = np.asarray(rew) if total is None else total + np.asarray(rew)
    assert grewards.pop().split()[1:] == [f"{v:.6f}" for v in total]
