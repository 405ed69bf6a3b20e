import os

# The ambient JAX install may prepend the 'axon' TPU platform regardless
# of JAX_PLATFORMS; honor the env var explicitly so `JAX_PLATFORMS=cpu
# python -m burn_ppo_tpu ...` (and the CLI e2e tests' spawned
# subprocesses) actually run on the requested backend. `--platform` still
# overrides from the command line.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from burn_ppo_tpu.cli import main

raise SystemExit(main())
