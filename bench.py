"""Headline benchmark: PPO training throughput (env steps/sec).

Runs the full fused train step (on-device rollout + GAE + PPO update) on
the reference's CartPole config shape (configs/cartpole.toml: 32 envs x
128 steps, hidden 64x2) scaled up to the TPU throughput sweet spot
(4096 envs: larger batches leave on-chip memory and lose ~40%), and
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

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "4096"))
    num_steps = int(os.environ.get("BENCH_NUM_STEPS", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "100"))

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
    train_step = make_train_step(network, env, cfg, tx)

    lr = jnp.asarray(1e-3, jnp.float32)
    ec = jnp.asarray(0.01, jnp.float32)
    sc = jnp.asarray(0.0, jnp.float32)

    # Run all iterations on-device in ONE jitted lax.scan: production TPU
    # training amortizes host round-trips over the logging window the same
    # way, and it keeps transport latency out of the device-throughput
    # measurement.  Episode logs are folded into a live checksum so XLA
    # can't dead-code-eliminate the bookkeeping the real Trainer consumes.
    def run_iters(state, n):
        def body(carry, _):
            s, acc = carry
            s2, metrics, logs = train_step(s, lr, ec, sc)
            acc = acc + jnp.sum(logs.completed) + metrics["policy_loss"]
            return (s2, acc), None
        (s_final, acc), _ = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.float32)), None, length=n
        )
        return acc

    run1 = jax.jit(lambda s: run_iters(s, 1))
    runN = jax.jit(lambda s: run_iters(s, iters))

    # Warmup / compile both programs.
    float(run1(state))
    float(runN(state))

    t0 = time.perf_counter()
    float(runN(state))
    dt_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run1(state))
    dt_1 = time.perf_counter() - t0
    # (dt_n - dt_1) / (iters - 1) cancels the constant dispatch+transport
    # floor, leaving steady-state per-iteration time.
    per_iter = max((dt_n - dt_1) / max(iters - 1, 1), 1e-9)

    sps = num_envs * num_steps / per_iter
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
