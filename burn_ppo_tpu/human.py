"""Terminal human-player input loop.

Parity with reference src/human.rs: prompt with the action mask enforced,
and commands help / render / random / hint / quit (human.rs:31-115).
"""

from __future__ import annotations

import random
import sys
from typing import Optional

import jax.numpy as jnp
import numpy as np

from burn_ppo_tpu.ppo.normalization import obs_norm_apply

HELP = """Commands:
  <action>   play an action (see the game's action format)
  help       show this help
  render     re-draw the board/state
  random     play a random valid action
  hint       show the model's action probabilities (if available)
  quit       exit the game
"""


def random_valid_action(env, state) -> int:
    mask = np.asarray(env.action_mask(state))
    valid = np.nonzero(mask)[0]
    return int(random.choice(valid.tolist()))


def prompt_human_action(env, state, hint_source=None) -> int:
    """Prompt until a valid action is given (mask-validated)."""
    mask = np.asarray(env.action_mask(state))
    while True:
        try:
            text = input("your move> ").strip()
        except EOFError:
            print("\n(quit)")
            sys.exit(0)
        if not text:
            continue
        low = text.lower()
        if low in ("quit", "exit", "q"):
            sys.exit(0)
        if low == "help":
            print(HELP)
            continue
        if low == "render":
            rendered = env.render(state)
            print(rendered if rendered else "(no renderer)")
            continue
        if low == "random":
            action = random_valid_action(env, state)
            print(f"(random) {env.describe_action(action)}")
            return action
        if low == "hint":
            if hint_source is None:
                print("(no model available for hints)")
                continue
            obs = env.obs(state)[None, :]
            if hint_source.obs_norm is not None:
                obs = obs_norm_apply(hint_source.obs_norm, obs)
            logits = hint_source.network.forward_actor(hint_source.params, obs)[0]
            # np.array, not np.asarray: a JAX array exposes a READ-ONLY
            # buffer, and the masked assignment below needs a copy.
            logits = np.array(logits)
            logits[~mask.astype(bool)] = -1e9
            probs = np.exp(logits - logits.max())
            probs /= probs.sum()
            order = np.argsort(-probs)
            for a in order[:5]:
                if mask[a]:
                    print(f"  {env.describe_action(int(a))}: {probs[a]:.1%}")
            continue
        try:
            action = env.parse_action(text)
        except Exception as e:  # noqa: BLE001
            print(f"invalid input: {e}")
            continue
        if action < 0 or action >= env.spec.num_actions or not mask[action]:
            print("that action is not legal right now")
            continue
        return action
