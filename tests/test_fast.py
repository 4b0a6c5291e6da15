"""Fast (lattice) engine: oracle parity, conservation laws, and behavior."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from die_tpu.core.rng import np_key
from die_tpu.fast.config import FastDynamics
from die_tpu.fast.init import fast_init_jax, fast_init_np
from die_tpu.fast.rollout import fast_rollout, oracle_fast_rollout

SIZE = (32, 32)


def test_init_parity():
    dyn = FastDynamics()
    a = fast_init_np(np_key(3), SIZE, dyn)
    b = fast_init_jax(jr.PRNGKey(3), SIZE, dyn)
    for x, y in zip(a[:-1], b[:-1]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    assert float(np.asarray(a.occ).sum()) > 0


@pytest.mark.parametrize("dyn", [
    FastDynamics(),
    FastDynamics(agents_die=True, food_infinite=False),
    FastDynamics(randomize_on_block=False, sense_dist=5),
])
def test_rollout_parity_bitwise(dyn):
    steps = 15
    st_np = fast_init_np(np_key(7), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(7), SIZE, dyn)
    o_state, o_rewards, o_nums = oracle_fast_rollout(
        dyn, st_np, np_key(11), steps)
    run = jax.jit(lambda s: fast_rollout(dyn, s, jr.PRNGKey(11), steps))
    j_state, j_rewards, j_nums = run(st_j)
    assert np.array_equal(o_rewards, np.asarray(j_rewards))
    assert np.array_equal(o_nums, np.asarray(j_nums))
    for x, y in zip(o_state[:-1], j_state[:-1]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_agent_count_conserved_without_death():
    dyn = FastDynamics(agents_die=False)
    st = fast_init_np(np_key(5), SIZE, dyn)
    n0 = int((st.occ > 0).sum())
    _, _, nums = oracle_fast_rollout(dyn, st, np_key(6), 20)
    assert np.all(nums == n0)


def test_occupancy_stays_binary_and_dirs_valid():
    dyn = FastDynamics()
    st = fast_init_np(np_key(9), SIZE, dyn)
    st2, _, _ = oracle_fast_rollout(dyn, st, np_key(10), 20)
    assert set(np.unique(st2.occ)) <= {0.0, 1.0}
    dirs = st2.dir[st2.occ > 0]
    assert dirs.min() >= 0 and dirs.max() <= 7
    assert np.all(dirs == np.floor(dirs))


def test_agents_actually_move_and_deposit():
    dyn = FastDynamics()
    st = fast_init_np(np_key(12), SIZE, dyn)
    st2, _, _ = oracle_fast_rollout(dyn, st, np_key(13), 10)
    # occupancy pattern changed and chem trail appeared
    assert not np.array_equal(st.occ, st2.occ)
    assert st2.chem.max() > 0


def test_trail_following_beats_blind():
    """Physarum-ness: with sensing (chem gradient following) agents cluster
    onto trails — chem concentration should be less uniform than with a
    zero-deposit control."""
    dyn = FastDynamics(deposit_coef=4.0, food_infinite=True)
    dyn0 = FastDynamics(deposit_coef=0.0, idle_deposit=0.0,
                        food_infinite=True)
    st = fast_init_np(np_key(20), (24, 24), dyn)
    st_a, _, _ = oracle_fast_rollout(dyn, st, np_key(21), 40)
    st_b, _, _ = oracle_fast_rollout(dyn0, st, np_key(21), 40)
    assert st_a.chem.max() > st_b.chem.max()


def test_death_reduces_population():
    dyn = FastDynamics(agents_die=True, rate_feed=0.0, cost_move=0.5,
                       deposit_coef=0.0, idle_deposit=0.0)
    st = fast_init_np(np_key(30), SIZE, dyn)
    n0 = int((st.occ > 0).sum())
    _, _, nums = oracle_fast_rollout(dyn, st, np_key(31), 20)
    assert nums[-1] < n0


def test_vmap_lockstep_fast():
    dyn = FastDynamics()
    B, steps = 4, 8
    states = [fast_init_jax(jr.PRNGKey(100 + b), SIZE, dyn) for b in range(B)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    keys = jnp.stack([jr.PRNGKey(200 + b) for b in range(B)])
    run_b = jax.jit(jax.vmap(lambda s, k: fast_rollout(dyn, s, k, steps)))
    st_b, rew_b, num_b = run_b(batched, keys)
    run_1 = jax.jit(lambda s, k: fast_rollout(dyn, s, k, steps))
    for b in range(B):
        sb = jax.tree.map(lambda x: x[b], batched)
        st1, rew1, num1 = run_1(sb, keys[b])
        assert np.array_equal(np.asarray(rew_b[b]), np.asarray(rew1)), b
        assert np.array_equal(np.asarray(st_b.occ[b]), np.asarray(st1.occ)), b


def test_render_adapter_shapes():
    from die_tpu.fast.render_adapter import (
        fast_state_to_agents,
        fast_state_to_medium,
    )
    from die_tpu.render.renderer import EnvRenderer

    dyn = FastDynamics()
    st = fast_init_np(np_key(40), SIZE, dyn)
    medium = fast_state_to_medium(st)
    agents = fast_state_to_agents(st)
    assert medium.shape == (3, *SIZE)
    assert agents.shape == (4, SIZE[0] * SIZE[1])
    frames = EnvRenderer(SIZE).render(medium, agents)
    assert len(frames) == 3
    # alive count preserved through the adapter
    assert agents[2].sum() == st.occ.sum()


def test_fast_sharded_equals_unsharded():
    from die_tpu.parallel.mesh import env_mesh, shard_env_batch

    dyn = FastDynamics()
    B, steps = 8, 6
    states = [fast_init_jax(jr.PRNGKey(300 + b), SIZE, dyn)
              for b in range(B)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    keys = jnp.stack([jr.PRNGKey(400 + b) for b in range(B)])
    run = jax.jit(jax.vmap(lambda s, k: fast_rollout(dyn, s, k, steps)))
    ref_st, ref_rew, _ = run(batched, keys)

    mesh = env_mesh()
    batched_s = shard_env_batch(mesh, batched)
    keys_s = shard_env_batch(mesh, keys)
    st_s, rew_s, _ = run(batched_s, keys_s)
    assert np.array_equal(np.asarray(ref_rew), np.asarray(rew_s))
    assert np.array_equal(np.asarray(ref_st.occ), np.asarray(st_s.occ))


def test_four_direction_lattice():
    dyn = FastDynamics(num_dirs=4)
    st_np = fast_init_np(np_key(17), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(17), SIZE, dyn)
    o_state, o_rew, o_num = oracle_fast_rollout(dyn, st_np, np_key(18), 10)
    j_state, j_rew, j_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(18), 10))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_state.occ, np.asarray(j_state.occ))
    dirs = o_state.dir[o_state.occ > 0]
    assert dirs.max() <= 3
    # population conserved, agents move
    assert o_num[-1] == int(st_np.occ.sum())
    assert not np.array_equal(st_np.occ, o_state.occ)


def test_sixteen_direction_lattice():
    """num_dirs=16 (Moore + knight offsets, ~22.5-degree turns — closest to
    the reference's default 30-degree turn_angle): bitwise oracle parity,
    conservation, movement, and use of the odd (knight) headings."""
    dyn = FastDynamics(num_dirs=16)
    st_np = fast_init_np(np_key(61), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(61), SIZE, dyn)
    o_state, o_rew, o_num = oracle_fast_rollout(dyn, st_np, np_key(62), 10)
    j_state, j_rew, j_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(62), 10))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    for x, y in zip(o_state[:-1], j_state[:-1]):
        assert np.array_equal(x, np.asarray(y))
    dirs = o_state.dir[o_state.occ > 0]
    assert dirs.max() <= 15
    assert np.any(dirs % 2 == 1)  # knight headings actually occur
    assert o_num[-1] == int(st_np.occ.sum())  # population conserved
    assert not np.array_equal(st_np.occ, o_state.occ)  # agents move


def test_sixteen_direction_born_die():
    """16-dir lattice with the full lifecycle (birth bits use the wider
    4-bit carving): oracle parity and food-mass conservation through
    births."""
    dyn = FastDynamics(num_dirs=16, agents_born=True, agents_die=True,
                       birth_threshold=0.5, food_infinite=True)
    st_np = fast_init_np(np_key(63), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(63), SIZE, dyn)
    o_state, o_rew, o_num = oracle_fast_rollout(dyn, st_np, np_key(64), 12)
    j_state, j_rew, j_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(64), 12))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_num, np.asarray(j_num))
    for x, y in zip(o_state[:-1], j_state[:-1]):
        assert np.array_equal(x, np.asarray(y))


def test_sixteen_direction_pallas_interpret():
    from die_tpu.fast.pallas_step import pallas_fast_rollout

    dyn = FastDynamics(num_dirs=16)
    st = fast_init_jax(jr.PRNGKey(65), (8, 128), dyn)
    ref = jax.jit(lambda s: fast_rollout(dyn, s, jr.PRNGKey(66), 4))(st)
    pal = jax.jit(lambda s: pallas_fast_rollout(dyn, s, jr.PRNGKey(66), 4,
                                                interpret=True))(st)
    assert np.array_equal(np.asarray(ref[1]), np.asarray(pal[1]))
    assert np.array_equal(np.asarray(ref[0].occ), np.asarray(pal[0].occ))
    assert np.array_equal(np.asarray(ref[0].dir), np.asarray(pal[0].dir))


def test_sixteen_direction_band_routing():
    """16-dir auto-routing: the 256^2 whole-field kernel overflows VMEM
    (~2x rolled intermediates), so choose_bands must route 256^2 to the
    banded kernel under the shrunken budget while 128^2 stays whole-field
    (both measured on v5e — docs/PERF.md)."""
    from die_tpu.fast.rollout import choose_bands

    d16 = FastDynamics(num_dirs=16)
    budget16 = 256 * 256 // 4  # fast_rollout_auto's num_dirs=16 budget
    assert choose_bands(d16, 256, 256, budget16) > 1
    assert 128 * 128 <= budget16  # 128^2 stays on the whole-field kernel
    # the default budget routes 8-dir 256^2 to the whole-field kernel
    assert choose_bands(FastDynamics(), 256, 256, 256 * 256) == 1


def test_per_step_priority_variant():
    dyn = FastDynamics(per_cell_priority=False)
    st_np = fast_init_np(np_key(21), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(21), SIZE, dyn)
    o_state, o_rew, o_num = oracle_fast_rollout(dyn, st_np, np_key(22), 10)
    j_state, j_rew, j_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(22), 10))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_state.occ, np.asarray(j_state.occ))
    assert o_num[-1] == int(st_np.occ.sum())  # conservation holds


def test_per_step_priority_pallas_interpret():
    from die_tpu.fast.pallas_step import pallas_fast_rollout

    dyn = FastDynamics(per_cell_priority=False)
    st = fast_init_jax(jr.PRNGKey(23), (8, 128), dyn)
    ref = jax.jit(lambda s: fast_rollout(dyn, s, jr.PRNGKey(24), 4))(st)
    pal = jax.jit(lambda s: pallas_fast_rollout(dyn, s, jr.PRNGKey(24), 4,
                                                interpret=True))(st)
    assert np.array_equal(np.asarray(ref[1]), np.asarray(pal[1]))
    assert np.array_equal(np.asarray(ref[0].occ), np.asarray(pal[0].occ))


@pytest.mark.slow
def test_long_rollout_invariants():
    from die_tpu.utils.invariants import check_fast_state

    for dyn in [FastDynamics(agents_die=True),
                FastDynamics(num_dirs=4, food_infinite=True),
                FastDynamics(per_cell_priority=False)]:
        st = fast_init_np(np_key(33), SIZE, dyn)
        st, _, nums = oracle_fast_rollout(dyn, st, np_key(34), 200)
        assert check_fast_state(st) == [], dyn
        if not dyn.agents_die:
            assert nums[-1] == nums[0]
        else:
            assert nums[-1] <= nums[0]


def test_agents_born():
    """Reproduction: population grows under abundance; agent_food mass is
    conserved through births (split, not created); parity holds."""
    dyn = FastDynamics(agents_born=True, birth_threshold=0.5,
                       food_infinite=True, rate_feed=0.3,
                       deposit_coef=0.0, idle_deposit=0.0, cost_move=0.0,
                       init_agent_ratio=0.05)
    st_np = fast_init_np(np_key(50), SIZE, dyn)
    st_j = fast_init_jax(jr.PRNGKey(50), SIZE, dyn)
    n0 = int(st_np.occ.sum())

    # parity over a rollout
    o_state, o_rew, o_num = oracle_fast_rollout(dyn, st_np, np_key(51), 12)
    j_state, j_rew, j_num = jax.jit(
        lambda s: fast_rollout(dyn, s, jr.PRNGKey(51), 12))(st_j)
    assert np.array_equal(o_rew, np.asarray(j_rew))
    assert np.array_equal(o_state.occ, np.asarray(j_state.occ))
    assert np.array_equal(o_state.agent_food, np.asarray(j_state.agent_food))

    # population grew
    assert o_num[-1] > n0
    # occupancy still binary; dirs valid
    from die_tpu.utils.invariants import check_fast_state

    assert check_fast_state(o_state) == []

    # food-mass conservation through a single birth step (no feed/cost):
    dyn0 = FastDynamics(agents_born=True, birth_threshold=0.5,
                        rate_feed=0.0, deposit_coef=0.0, idle_deposit=0.0,
                        cost_move=0.0, food_infinite=True,
                        init_agent_ratio=0.1)
    st = fast_init_np(np_key(52), SIZE, dyn0)
    from die_tpu.fast.rollout import np_step_bits
    from die_tpu.fast.env import fast_step

    mass0 = float(st.agent_food.sum())
    st2, _, _ = fast_step(dyn0, st, np_step_bits(dyn0, np_key(53), 0,
                                                 st.occ.shape))
    assert float(st2.agent_food.sum()) == pytest.approx(mass0, rel=1e-5)
