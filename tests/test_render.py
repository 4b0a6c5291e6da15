"""Renderer output shapes/values and animation writer smoke test."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import jax.random as jr

from die_tpu.core import channels as ch
from die_tpu.core.config import Dynamics
from die_tpu.core.init import init_env_state
from die_tpu.render.renderer import EnvRenderer, FieldTrace


SIZE = (16, 16)


def _state():
    return init_env_state(jr.PRNGKey(4), SIZE, Dynamics(init_agent_ratio=0.2))


def test_field_trace_decay():
    tr = FieldTrace((4, 4), trace_steps=8)
    f = np.ones((4, 4), np.float32)
    tr.update(f)
    tr.update(np.zeros((4, 4), np.float32))
    assert np.allclose(tr.trace, 1.0 - 1.0 / 8)


def test_renderer_frames():
    st = _state()
    r = EnvRenderer(SIZE)
    frames = r.render(st.medium, st.agents)
    assert len(frames) == 3
    med, trace, agents = frames
    assert med.shape == (*SIZE, 3)
    assert trace.shape == (*SIZE, 4)
    assert agents.shape == (SIZE[1], SIZE[0], 4)
    assert med.min() >= 0 and med.max() <= 1
    # agents channel maps occupancy into R of the medium composite
    occ = np.asarray(st.medium[ch.CH_MED_AGENTS])
    assert np.array_equal(med[:, :, 0], occ)


def test_color_remap():
    st = _state()
    r = EnvRenderer(SIZE, field_colors_id="one")
    med = r.render(st.medium, st.agents)[0]
    assert med.shape == (*SIZE, 3)
    assert np.isfinite(med).all()


def test_animation_gif(tmp_path):
    from die_tpu.render.plotting import InteractivePlotter, render_animation
    import jax

    dyn = Dynamics(init_agent_ratio=0.2)
    from die_tpu.models.static import BrownianPolicy
    from die_tpu.parallel.rollout import policy_env_step

    policy = BrownianPolicy()
    state = {"s": _state()}
    renderer = EnvRenderer(SIZE)

    step = jax.jit(lambda s, k: policy_env_step(dyn, policy, None, s, None, k))

    def frame_step(i):
        s, _, _ = step(state["s"], jr.fold_in(jr.PRNGKey(0), i))
        state["s"] = s

    plotter = InteractivePlotter.get(
        lambda: renderer.render(state["s"].medium, state["s"].agents),
        ion=False)
    out = tmp_path / "anim.gif"
    render_animation(frame_step, plotter, str(out), num_frames=3)
    assert out.exists() and out.stat().st_size > 0
