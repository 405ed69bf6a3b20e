from burn_ppo_tpu.ops.categorical import (
    apply_action_mask,
    entropy_categorical,
    log_prob_categorical,
    masked_log_softmax,
    sample_categorical,
    sample_with_temperature,
)
from burn_ppo_tpu.ops.gae import compute_gae, compute_gae_multiplayer
from burn_ppo_tpu.ops.initializers import orthogonal

__all__ = [
    "apply_action_mask",
    "entropy_categorical",
    "log_prob_categorical",
    "masked_log_softmax",
    "sample_categorical",
    "sample_with_temperature",
    "compute_gae",
    "compute_gae_multiplayer",
    "orthogonal",
]
