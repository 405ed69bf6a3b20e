"""Checkpoint layer tests (reference src/checkpoint.rs has 13: round
trips, symlinks, metadata structure, atomicity)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.checkpoint import (
    CheckpointManager,
    build_metadata,
    load_pytree,
    network_from_metadata,
    save_pytree,
)
from burn_ppo_tpu.models.network import ActorCriticNetwork


def make_net(**kw):
    defaults = dict(
        network_type="mlp", obs_dim=5, action_count=2,
        hidden_size=16, num_hidden=1, activation="tanh",
    )
    defaults.update(kw)
    return ActorCriticNetwork(**defaults)


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": (jnp.ones((2, 3)), jnp.zeros(()))}
    save_pytree(tmp_path / "t.npz", tree)
    out = load_pytree(tmp_path / "t.npz", tree)
    np.testing.assert_array_equal(out["a"], np.arange(4.0))
    np.testing.assert_array_equal(out["b"][0], np.ones((2, 3)))


def test_pytree_leaf_count_mismatch(tmp_path):
    save_pytree(tmp_path / "t.npz", {"a": jnp.zeros(3)})
    with pytest.raises(ValueError, match="architecture mismatch"):
        load_pytree(tmp_path / "t.npz", {"a": jnp.zeros(3), "b": jnp.zeros(2)})


def test_pytree_dtype_cast(tmp_path):
    save_pytree(tmp_path / "t.npz", jnp.arange(3, dtype=jnp.int32))
    out = load_pytree(tmp_path / "t.npz", jnp.zeros(3, jnp.float32))
    assert out.dtype == jnp.float32


def test_save_creates_layout_and_latest(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=128, env_name="cartpole", network=net, num_players=1)
    path = mgr.save(128, params, {"m": jnp.zeros(1)}, {"obs_norm": None}, meta)
    assert path.name == "step_00000128"
    assert (path / "model.npz").exists()
    assert (path / "optimizer.npz").exists()
    assert (path / "metadata.json").exists()
    assert not (path / "obs_norm.npz").exists()  # None component skipped
    latest = tmp_path / "checkpoints" / "latest"
    assert latest.is_symlink()
    assert latest.resolve() == path.resolve()


def test_model_roundtrip_through_metadata(tmp_path):
    net = make_net(hidden_size=32, num_hidden=2)
    params = net.init(jax.random.PRNGKey(1))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=1, env_name="cartpole", network=net, num_players=1)
    path = mgr.save(1, params, {}, {}, meta)
    net2, params2, meta2 = CheckpointManager.load_model(path)
    assert net2.hidden_size == 32 and net2.num_hidden == 2
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    obs = jnp.ones((3, 5))
    l1, v1 = net.forward(params, obs)
    l2, v2 = net2.forward(params2, obs)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))


def test_metadata_fields_match_reference_schema(tmp_path):
    net = make_net()
    meta = build_metadata(
        step=5, env_name="skull", network=net, num_players=4,
        avg_return=1.5, recent_returns=[1.0, 2.0], forked_from="skull_001",
        rng_seed=7, exploitability_vs_pool=0.25,
        normalize_obs=True, normalize_values=True,
    )
    # CheckpointMetadata parity (checkpoint.rs:26-96)
    for key in (
        "step", "env_name", "obs_dim", "action_count", "num_players",
        "hidden_size", "num_hidden", "activation", "network_type",
        "split_networks", "privileged_obs_dim", "critic_hidden_size",
        "critic_num_hidden", "obs_shape", "recent_returns", "forked_from",
        "rng_seed", "exploitability_vs_pool", "normalize_obs",
        "normalize_values", "avg_return", "conv_channels", "kernel_size",
    ):
        assert key in meta, key
    assert meta["forked_from"] == "skull_001"
    assert json.loads(json.dumps(meta)) == meta  # JSON-serializable


def test_network_from_metadata_ctde():
    net = ActorCriticNetwork(
        network_type="ctde", obs_dim=270, action_count=49,
        hidden_size=256, num_hidden=2, activation="relu",
        privileged_obs_dim=120, critic_hidden_size=512, critic_num_hidden=3,
    )
    meta = build_metadata(step=0, env_name="liars_dice", network=net, num_players=4)
    net2 = network_from_metadata(meta)
    assert net2.network_type == "ctde"
    assert net2.privileged_obs_dim == 120
    assert net2.critic_hidden_size == 512
    assert net2.critic_num_hidden == 3


def test_network_from_metadata_legacy_defaults():
    """Old metadata without newer keys loads with defaults
    (legacy-MLP fallback, checkpoint.rs:195-272)."""
    meta = {
        "obs_dim": 5, "action_count": 2, "hidden_size": 64,
        "num_hidden": 2, "activation": "tanh",
    }
    net = network_from_metadata(meta)
    assert net.network_type == "mlp"
    assert net.split_networks is False


def test_list_steps_sorted(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    for step in (300, 100, 200):
        meta = build_metadata(step=step, env_name="cartpole", network=net, num_players=1)
        mgr.save(step, params, {}, {}, meta)
    assert mgr.list_steps() == [100, 200, 300]


def test_resolve_variants(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=64, env_name="cartpole", network=net, num_players=1)
    path = mgr.save(64, params, {}, {}, meta)
    assert mgr.resolve("latest") == path.resolve()
    assert mgr.resolve("step_00000064") == path.resolve()
    assert mgr.resolve("64") == path
    assert mgr.resolve("best") is None
    mgr.set_best(64)
    assert mgr.resolve("best") == path.resolve()


def test_best_symlink_retarget(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    for step in (1, 2):
        meta = build_metadata(step=step, env_name="cartpole", network=net, num_players=1)
        mgr.save(step, params, {}, {}, meta)
    mgr.set_best(1)
    mgr.set_best(2)  # atomic retarget over existing link
    assert mgr.resolve("best").name == "step_00000002"


def test_save_overwrites_existing_step(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=9, env_name="cartpole", network=net, num_players=1)
    mgr.save(9, params, {}, {"obs_norm": {"x": jnp.zeros(2)}}, meta)
    mgr.save(9, params, {}, {}, meta)  # second save: no obs_norm
    assert not (mgr.step_dir(9) / "obs_norm.npz").exists()


def test_no_tmp_dirs_left_behind(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=3, env_name="cartpole", network=net, num_players=1)
    mgr.save(3, params, {}, {}, meta)
    leftovers = [p for p in (tmp_path / "checkpoints").iterdir() if p.name.startswith(".tmp_")]
    assert leftovers == []


def test_load_component_absent_returns_none(tmp_path):
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=2, env_name="cartpole", network=net, num_players=1)
    path = mgr.save(2, params, {}, {}, meta)
    assert CheckpointManager.load_component(path, "popart", {"m": jnp.zeros(1)}) is None


def test_load_obs_normalizer_gated_by_metadata(tmp_path):
    from burn_ppo_tpu.ppo.normalization import ObsNormState

    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    norm = ObsNormState.create(5)
    meta = build_metadata(
        step=4, env_name="cartpole", network=net, num_players=1, normalize_obs=True
    )
    path = mgr.save(4, params, {}, {"obs_norm": norm}, meta)
    out = CheckpointManager.load_obs_normalizer(path)
    assert out is not None

    meta2 = build_metadata(
        step=5, env_name="cartpole", network=net, num_players=1, normalize_obs=False
    )
    path2 = mgr.save(5, params, {}, {}, meta2)
    assert CheckpointManager.load_obs_normalizer(path2) is None


def test_fetch_tree_single_transfer_roundtrip():
    """fetch_tree must return bit-identical host leaves for mixed-dtype
    trees (incl. int8 vs uint8, whose naive concatenation would type-
    promote and corrupt offsets), non-array passthroughs, and empties."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_ppo_tpu.checkpoint import fetch_tree

    tree = {
        "f32": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) * 0.7,
        "i8": jnp.asarray([-3, 0, 127, -128], jnp.int8),
        "u8": jnp.asarray([0, 255, 7], jnp.uint8),
        "key": jax.random.PRNGKey(5),
        "bool": jnp.asarray([True, False, True]),
        "bf16": jnp.asarray(2.25, jnp.bfloat16),
        "i32": jnp.arange(5, dtype=jnp.int32) - 2,
        "empty": jnp.zeros((0, 3), jnp.float32),
        "host": np.arange(4, dtype=np.int64),  # passthrough, never packed
        "scalar": 11,
    }
    out = fetch_tree(tree)
    ref = jax.tree_util.tree_map(
        lambda l: np.asarray(l) if hasattr(l, "dtype") else l, tree
    )
    for (pa, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(out),
        jax.tree_util.tree_leaves_with_path(ref),
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))
        if hasattr(vb, "dtype"):
            assert np.asarray(va).dtype == vb.dtype, (pa, vb.dtype)


def test_put_tree_single_transfer_roundtrip():
    """put_tree must upload mixed-dtype host trees in one transfer and
    return device leaves bit-identical to per-leaf jnp.asarray uploads
    (incl. bool, sub-word ints, bf16 scalars, empties, passthroughs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_ppo_tpu.checkpoint import put_tree

    tree = {
        "f32": np.arange(12, dtype=np.float32).reshape(3, 4) * 0.7,
        "i8": np.asarray([-3, 0, 127, -128], np.int8),
        "u8": np.asarray([0, 255, 7], np.uint8),
        "bool": np.asarray([True, False, True]),
        "bf16": np.asarray(2.25, jnp.bfloat16),
        "i32": np.arange(5, dtype=np.int32) - 2,
        "i64": np.arange(4, dtype=np.int64),  # canonicalizes to i32
        "empty": np.zeros((0, 3), np.float32),
        "dev": jnp.asarray([1.0, 2.0]),  # already on device, untouched
        "scalar": 11,
    }
    out = put_tree(tree)
    ref = jax.tree_util.tree_map(
        lambda l: jnp.asarray(l) if hasattr(l, "dtype") else l, tree
    )
    for (pa, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(out),
        jax.tree_util.tree_leaves_with_path(ref),
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))
        if hasattr(vb, "dtype"):
            assert isinstance(va, jax.Array) or not hasattr(va, "shape"), pa
            assert jnp.asarray(va).dtype == vb.dtype, (pa, vb.dtype)


def test_load_pytree_returns_device_arrays(tmp_path):
    """load_pytree's packed-upload path must land leaves on device with
    the template's dtypes, bit-identical to what was saved."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_ppo_tpu.checkpoint import load_pytree, save_pytree

    tree = {
        "w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) * 1.3,
        "b": jnp.asarray([1, -2, 3], jnp.int32),
        "flag": jnp.asarray([True, False]),
        "k": jax.random.PRNGKey(7),
    }
    p = tmp_path / "t.npz"
    save_pytree(p, tree)
    out = load_pytree(p, tree)
    for (pa, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(out),
        jax.tree_util.tree_leaves_with_path(tree),
    ):
        assert isinstance(va, jax.Array), pa
        assert va.dtype == vb.dtype, pa
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb), err_msg=str(pa))


def test_overwrite_save_failure_restores_old(tmp_path, monkeypatch):
    """If the overwrite rename fails after the old dir was parked, the
    previous checkpoint must be restored — otherwise the step dir is
    gone and 'latest' dangles (unresumable run)."""
    import pathlib

    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=9, env_name="cartpole", network=net, num_players=1)
    mgr.save(9, params, {}, {}, meta)
    final_name = mgr.step_dir(9).name

    real_rename = pathlib.Path.rename

    def boom(self, target):
        if self.name.startswith(".tmp_") and pathlib.Path(target).name == final_name:
            raise OSError("injected failure")
        return real_rename(self, target)

    monkeypatch.setattr(pathlib.Path, "rename", boom)
    with pytest.raises(OSError, match="injected"):
        mgr.save(9, params, {}, {}, meta)
    monkeypatch.undo()

    assert mgr.step_dir(9).exists()
    assert (mgr.step_dir(9) / "model.npz").exists()
    assert mgr.resolve("latest") is not None
    assert mgr.resolve("latest").name == final_name
    # Parked dir cleaned up or at least ignored by step scans.
    assert mgr.list_steps() == [9]


def test_build_metadata_casts_numpy_scalars(tmp_path):
    """np.float32 best/exploitability fields must not poison json.dumps
    at save time (NumPy scalars are not JSON serializable)."""
    net = make_net()
    meta = build_metadata(
        step=1, env_name="cartpole", network=net, num_players=1,
        best_avg_return=np.float32(1.5),
        exploitability_vs_pool=np.float32(0.25),
    )
    s = json.dumps(meta)
    assert '"best_avg_return": 1.5' in s
    assert isinstance(meta["best_avg_return"], float)
    assert isinstance(meta["exploitability_vs_pool"], float)


def test_load_model_template_is_abstract(tmp_path, monkeypatch):
    """load_model must build its restore template with eval_shape (no
    real device init): loading dozens of pool/tournament checkpoints
    would otherwise pay full orthogonal-init computation per load."""
    net = make_net()
    params = net.init(jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path)
    meta = build_metadata(step=4, env_name="cartpole", network=net, num_players=1)
    path = mgr.save(4, params, {}, {}, meta)

    from burn_ppo_tpu.models import network as network_mod

    real_init = network_mod.ActorCriticNetwork.init

    def counting_init(self, key):
        # Under eval_shape the key is an abstract tracer; a concrete
        # jax.Array key means real device init work.
        assert isinstance(key, jax.core.Tracer), (
            "load_model ran a concrete network.init"
        )
        return real_init(self, key)

    monkeypatch.setattr(network_mod.ActorCriticNetwork, "init", counting_init)
    _, loaded, _ = CheckpointManager.load_model(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
