"""Headline benchmark: PPO training throughput (env steps/sec).

Runs the full fused train step (on-device rollout + GAE + PPO update) on
the reference's CartPole config shape (configs/cartpole.toml: 32 envs x
128 steps, hidden 64x2) scaled up to a TPU-appropriate env count, and
reports env-steps/second.

The reference publishes no SPS numbers (BASELINE.json: published = {});
``vs_baseline`` therefore compares against the most recent recorded
BENCH_r*.json in the repo, or 1.0 on the first round.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time


def previous_bench_value() -> float | None:
    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            data = json.loads(open(path).read())
            v = float(data.get("value", 0.0))
            if v > 0:
                best = v  # latest round wins (sorted order)
        except Exception:
            continue
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from burn_ppo_tpu.config import Config
    from burn_ppo_tpu.envs import make_env
    from burn_ppo_tpu.parallel.mesh import make_mesh, replicate, shard_rollout_carry
    from burn_ppo_tpu.ppo.normalization import ObsNormState
    from burn_ppo_tpu.ppo.rollout import init_rollout_carry
    from burn_ppo_tpu.ppo.update import PPOUpdateConfig, make_optimizer
    from burn_ppo_tpu.train import TrainState, build_network_for_env, make_train_step

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "2048"))
    num_steps = int(os.environ.get("BENCH_NUM_STEPS", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    cfg = Config(
        env="cartpole",
        num_envs=num_envs,
        num_steps=num_steps,
        total_steps=10**9,
        normalize_obs=True,
        hidden_size=64,
        num_hidden=2,
        num_minibatches=4,
        num_epochs=4,
        seed=0,
        opponent_pool_fraction=0.0,
    )
    mesh = make_mesh()
    env = make_env(cfg.env)
    network = build_network_for_env(env, cfg)
    tx = make_optimizer(
        PPOUpdateConfig(max_grad_norm=cfg.max_grad_norm, adam_epsilon=cfg.adam_epsilon)
    )
    key = jax.random.PRNGKey(0)
    k_params, k_carry, k_update = jax.random.split(key, 3)
    params = replicate(network.init(k_params), mesh)
    opt_state = replicate(tx.init(jax.device_get(params)), mesh)
    carry = shard_rollout_carry(init_rollout_carry(env, num_envs, k_carry), mesh)
    state = TrainState(
        params=params,
        opt_state=opt_state,
        carry=carry,
        obs_norm=replicate(ObsNormState.create(env.spec.obs_dim), mesh),
        popart=None,
        update_key=k_update,
    )
    train_step = jax.jit(make_train_step(network, env, cfg, tx), donate_argnums=(0,))

    lr = jnp.asarray(1e-3, jnp.float32)
    ec = jnp.asarray(0.01, jnp.float32)
    sc = jnp.asarray(0.0, jnp.float32)

    # Warmup / compile
    state, metrics, _ = train_step(state, lr, ec, sc)
    jax.block_until_ready(metrics["policy_loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics, _ = train_step(state, lr, ec, sc)
    jax.block_until_ready(metrics["policy_loss"])
    dt = time.perf_counter() - t0

    sps = iters * num_envs * num_steps / dt
    prev = previous_bench_value()
    vs = sps / prev if prev else 1.0
    print(
        json.dumps(
            {
                "metric": "cartpole_train_env_steps_per_sec",
                "value": round(sps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
