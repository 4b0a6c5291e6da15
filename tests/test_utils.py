"""utils: metrics sinks, ChannelLogger, profiling timer, postprocess_action,
distributed helpers (single-process), render hooks."""
import json

import numpy as np
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.core.rng import np_key
from die_tpu.oracle.env import oracle_init_state


def test_jsonl_sink(tmp_path):
    from die_tpu.utils.metrics import JsonlSink

    p = tmp_path / "m.jsonl"
    s = JsonlSink(str(p))
    s(0, {"a": 1.0})
    s(1, {"a": 2.0})
    s.close()
    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 2 and lines[1]["a"] == 2.0


def test_channel_logger():
    from die_tpu.utils.metrics import ChannelLogger

    outs = []
    arr = np.arange(12, dtype=np.float32).reshape(4, 3)
    cl = ChannelLogger(arr, channels=[0, 1], num=2, logger=outs.append)
    arr2 = arr + 1
    cl.log_update(arr2)
    assert any("delta" in o for o in outs)
    assert np.allclose(cl.delta, 1.0)


def test_step_timer():
    from die_tpu.utils.profiling import StepTimer

    t = StepTimer()
    t.update(100)
    t.update(100)
    assert t.total_steps == 200
    assert t.rate > 0


def test_postprocess_action():
    from die_tpu.models.base import postprocess_action

    st = oracle_init_state(np_key(3), (8, 8), Dynamics(init_agent_ratio=0.3),
                           16)
    action = np.ones((3, 16), np.float32)
    masked = postprocess_action(st.agents, action)
    dead = st.agents[ch.CH_AGT_ALIVE] == 0
    assert np.all(masked[:, dead] == 0)
    assert np.all(masked[:, ~dead] == 1)


def test_distributed_single_process():
    from die_tpu.parallel.distributed import (
        global_env_mesh,
        host_local_batch_slice,
        process_info,
    )

    info = process_info()
    assert info["process_count"] == 1
    assert global_env_mesh().devices.size == 8
    assert host_local_batch_slice(16) == slice(0, 16)


def test_policy_render_hooks():
    from die_tpu.models.gradient import PhysarumPolicy
    from die_tpu.models.nca import NCAPolicy

    st = init_env_state(jr.PRNGKey(2), (8, 8), Dynamics(), 16)
    obs = (st.agents, st.medium)
    p = PhysarumPolicy(max_agents=16)
    imgs = p.render(obs)
    assert imgs[0].shape == (8, 8, 3)
    n = NCAPolicy(kernel_sizes=(3,))
    params = n.init_model_params(jr.PRNGKey(1))
    imgs = n.render(params, obs)
    assert imgs[0].shape == (8, 8, 3)


def test_invariants_exact_engine():
    from die_tpu.utils.invariants import assert_invariants, check_env_state

    st = oracle_init_state(np_key(8), (12, 12), Dynamics(init_agent_ratio=0.2))
    assert check_env_state(st) == []
    assert_invariants(st)
    # corrupt: alive agent with coord out of range
    st.agents[0, 0] = 2.0
    st.agents[2, 0] = 1.0
    assert any("coords" in v for v in check_env_state(st))


def test_invariants_fast_engine():
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.rollout import oracle_fast_rollout
    from die_tpu.utils.invariants import (
        check_fast_state,
        mass_conservation_delta,
    )

    dyn = FastDynamics()
    st = fast_init_np(np_key(9), (16, 16), dyn)
    assert check_fast_state(st) == []
    st2, _, _ = oracle_fast_rollout(dyn, st, np_key(10), 5)
    assert check_fast_state(st2) == []
    assert mass_conservation_delta(st, st2) == 0.0


def test_invariants_fast_engine_16dir():
    """Valid 16-direction states pass; the heading bound follows the lattice
    (regression for the 8-dir hardcode, VERDICT r3 weak #4)."""
    from die_tpu.fast.config import FastDynamics
    from die_tpu.fast.init import fast_init_np
    from die_tpu.fast.rollout import oracle_fast_rollout
    from die_tpu.utils.invariants import check_fast_state

    dyn = FastDynamics(num_dirs=16)
    st = fast_init_np(np_key(11), (16, 16), dyn)
    st2, _, _ = oracle_fast_rollout(dyn, st, np_key(12), 5)
    occ = np.asarray(st2.occ)
    d = np.asarray(st2.dir)[occ > 0]
    assert d.size and d.max() > 7, "rollout never produced a heading > 7"
    assert check_fast_state(st2, dynamics=dyn) == []
    assert check_fast_state(st2, num_dirs=16) == []
    # the 8-dir bound still rejects those headings
    assert any("16" not in v and "8-direction" in v
               for v in check_fast_state(st2))


def test_mask_duplicates():
    from die_tpu.utils.dedup import index_select, mask_duplicates

    a = np.array([3, 1, 3, 2, 1, 3])
    first = mask_duplicates(a, keep="first")
    assert list(first) == [False, False, True, False, True, True]
    none = mask_duplicates(a, keep="none")
    assert list(none) == [True, True, True, False, True, True]
    sel = index_select(np.arange(10) * 2, np.array([1, 3]))
    assert list(sel) == [2, 6]


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from die_tpu.utils.profiling import annotate, trace

    logdir = tmp_path / "trace"
    with trace(str(logdir)):
        with annotate("die_tpu_test_scope"):
            float(np.asarray(jnp.arange(8.0).sum()))
    assert any(logdir.rglob("*")), "no trace files written"


def test_substep_named_scopes_in_hlo():
    """The six substeps carry die/* named scopes (jax.named_scope), so
    device traces / op profiles attribute time per substep — and the names
    must survive into the lowered module's location metadata."""
    import jax
    import jax.random as jr

    from die_tpu.core.config import Dynamics, FlowConfig
    from die_tpu.core.env import env_step
    from die_tpu.core.init import init_env_state

    dyn = Dynamics(agents_die=True, flow=FlowConfig(kind="wave"))
    state = init_env_state(jr.PRNGKey(0), (16, 16), dyn)
    action = np.zeros((3, state.agents.shape[-1]), np.float32)
    text = jax.jit(lambda s, a: env_step(dyn, s, a)).lower(
        state, action).as_text(debug_info=True)
    for name in ("die/move", "die/deposit_layout", "die/feed",
                 "die/food_flow", "die/diffuse_decay"):
        assert name in text, name


def test_package_exports():
    import die_tpu
    import die_tpu.fast as fast
    import die_tpu.models as models

    assert die_tpu.Dynamics and die_tpu.init_env_state
    assert models.PhysarumPolicy and models.NCAPolicy
    assert fast.FastDynamics and fast.fast_rollout
