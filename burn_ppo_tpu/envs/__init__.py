from burn_ppo_tpu.envs.base import Environment, EnvSpec

_REGISTRY = {}


def register(name: str, factory):
    _REGISTRY[name] = factory


def make_env(name: str, **kwargs) -> Environment:
    """Instantiate an environment by name (reference envs/mod.rs dispatch)."""
    # Import lazily so each env module registers itself. Unguarded: a
    # broken env module must surface its real ImportError, not degrade
    # into a misleading "Unknown environment".
    from burn_ppo_tpu.envs import cartpole  # noqa: F401
    from burn_ppo_tpu.envs import connect_four  # noqa: F401
    from burn_ppo_tpu.envs import liars_dice  # noqa: F401
    from burn_ppo_tpu.envs import skull  # noqa: F401

    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown environment '{name}'. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)


def registered_envs():
    """All registered env names (config validation, reference
    config.rs:1487-1492)."""
    from burn_ppo_tpu.envs import cartpole  # noqa: F401
    from burn_ppo_tpu.envs import connect_four  # noqa: F401
    from burn_ppo_tpu.envs import liars_dice  # noqa: F401
    from burn_ppo_tpu.envs import skull  # noqa: F401

    return set(_REGISTRY)


__all__ = ["Environment", "EnvSpec", "make_env", "register", "registered_envs"]
