"""Fixed channel-index schema.

The reference keys arrays by xarray channel *labels*
(``DataChannels`` at core/base_types.py:31-36).  TPU-native arrays are plain
``f32[C, ...]`` tensors, so the labels become integer constants with the same
order and meaning.
"""
from __future__ import annotations

# medium: f32[3, W, H] — reference ('agents', 'env_food', 'chem1')
MEDIUM_CHANNELS = ("agents", "env_food", "chem1")
CH_MED_AGENTS = 0
CH_MED_FOOD = 1
CH_MED_CHEM = 2
NUM_MEDIUM_CHANNELS = 3

# agents: f32[4, N] — reference ('x', 'y', 'alive', 'agent_food')
AGENT_CHANNELS = ("x", "y", "alive", "agent_food")
CH_AGT_X = 0
CH_AGT_Y = 1
CH_AGT_ALIVE = 2
CH_AGT_FOOD = 3
NUM_AGENT_CHANNELS = 4

# actions: f32[3, N] — reference ('dx', 'dy', 'deposit1')
ACTION_CHANNELS = ("dx", "dy", "deposit1")
CH_ACT_DX = 0
CH_ACT_DY = 1
CH_ACT_DEPOSIT = 2
NUM_ACTION_CHANNELS = 3

# --- RNG fold tags (the draw-order contract) ---------------------------------
# step-level: k_t = fold_in(rollout_key, t); then
TAG_POLICY = 0   # k_policy = fold_in(k_t, TAG_POLICY) — consumed by the policy
TAG_ENV = 1      # reserved for future env randomness (agents_born etc.)

# init-level: from an init key
TAG_INIT_PERLIN = 0
TAG_INIT_OCCUPANCY = 1
TAG_INIT_AGENT_FOOD = 2

# policy-internal draw sites (fold from k_policy)
TAG_DRAW_0 = 0
TAG_DRAW_1 = 1
TAG_DRAW_2 = 2

# session-level: how a master key splits into the three sub-streams
TAG_SESSION_ENV_INIT = 0
TAG_SESSION_POLICY_INIT = 1
TAG_SESSION_ROLLOUT = 2
