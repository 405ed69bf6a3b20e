"""Opponent pool + vs-pool training tests (reference opponent_pool.rs
tests: EMA convergence, selection probability properties; e2e.rs
opponent-pool training)."""

import json

import numpy as np
import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.schedule import Schedule
from burn_ppo_tpu.selfplay.opponent_pool import OpponentPool, OpponentStats
from burn_ppo_tpu.selfplay.rating_history import RatingHistory
from burn_ppo_tpu.train import Trainer


def make_pool(tmp_path, **kw) -> OpponentPool:
    return OpponentPool(tmp_path, **kw)


def test_ema_win_rate_convergence(tmp_path):
    """win_rate is the LEARNER's win rate (opponent_pool.rs:40)."""
    pool = make_pool(tmp_path, select_alpha=0.1)
    pool.add_checkpoint("step_00000100", 100)
    # learner always beats this opponent -> win rate climbs toward 1
    for _ in range(100):
        pool.queue_game_result(["step_00000100"], 1, [2])
        pool.apply_pending_updates()
    assert pool.stats["step_00000100"].win_rate > 0.99
    # learner always loses -> toward 0
    pool.add_checkpoint("step_00000200", 200)
    for _ in range(100):
        pool.queue_game_result(["step_00000200"], 2, [1])
        pool.apply_pending_updates()
    assert pool.stats["step_00000200"].win_rate < 0.01


def test_tie_counts_as_learner_loss(tmp_path):
    """Reference parity (opponent_pool.rs:603): learner_won is a STRICT
    placement comparison, so a tie does not raise win_rate."""
    pool = make_pool(tmp_path, select_alpha=0.5)
    pool.add_checkpoint("a", 1)
    pool.queue_game_result(["a"], 2, [2])  # tied game
    pool.apply_pending_updates()
    assert pool.stats["a"].win_rate == pytest.approx(0.5 * 0.5 + 0.0 * 0.5)


def test_ema_applied_once_per_rotation(tmp_path):
    pool = make_pool(tmp_path, select_alpha=0.5)
    pool.add_checkpoint("a", 1)
    # 10 games queued in ONE rotation => one EMA step with batch average
    for _ in range(10):
        pool.queue_game_result(["a"], 2, [1])  # learner loses
    pool.apply_pending_updates()
    assert pool.stats["a"].win_rate == pytest.approx(0.5 * 0.5 + 0.0 * 0.5)
    assert pool.stats["a"].games_played == 10


def test_selection_weights_focus_hard_opponents(tmp_path):
    """(1 - learner_win_rate)^p prioritizes opponents the learner LOSES
    to (opponent_pool.rs:431) — the hard opponent gets ~100x the weight."""
    pool = make_pool(tmp_path, select_exponent=2.0)
    pool.add_checkpoint("weak", 1)
    pool.add_checkpoint("hard", 2)
    pool.stats["weak"].win_rate = 0.9  # learner beats it 90%
    pool.stats["hard"].win_rate = 0.1  # learner loses 90%
    w = pool.selection_weights()
    assert w["hard"] / w["weak"] > 20  # (0.9/0.1)^2 = 81


def test_selection_weights_numerical_stability(tmp_path):
    pool = make_pool(tmp_path, select_exponent=8.0)
    pool.add_checkpoint("a", 1)
    pool.add_checkpoint("b", 2)
    pool.stats["a"].win_rate = 1.0
    pool.stats["b"].win_rate = 0.0
    w = pool.selection_weights()
    assert np.isfinite(list(w.values())).all()
    assert w["a"] > 0  # floored, never exactly 0


def test_sample_without_replacement(tmp_path):
    pool = make_pool(tmp_path, max_active=3)
    for i in range(10):
        pool.add_checkpoint(f"step_{i:08d}", i)
    active = pool.sample_active()
    assert len(active) == 3
    assert len(set(active)) == 3


def test_stats_persistence_roundtrip(tmp_path):
    pool = make_pool(tmp_path)
    (tmp_path / "checkpoints" / "x").mkdir(parents=True)
    pool.add_checkpoint("x", 5)
    pool.stats["x"].win_rate = 0.7
    pool.save_stats()
    pool2 = make_pool(tmp_path)
    assert pool2.stats["x"].win_rate == pytest.approx(0.7)
    assert pool2.stats["x"].step == 5


def test_stats_load_drops_deleted_checkpoints(tmp_path):
    """Stats entries whose checkpoint dirs were deleted from disk must
    not survive a reload — sampling one would crash the first rotation
    with FileNotFoundError."""
    pool = make_pool(tmp_path)
    (tmp_path / "checkpoints" / "step_00000001").mkdir(parents=True)
    (tmp_path / "checkpoints" / "step_00000002").mkdir(parents=True)
    pool.add_checkpoint("step_00000001", 1)
    pool.add_checkpoint("step_00000002", 2)
    pool.save_stats()
    import shutil

    shutil.rmtree(tmp_path / "checkpoints" / "step_00000001")
    pool2 = make_pool(tmp_path)
    assert "step_00000001" not in pool2.stats
    assert "step_00000002" in pool2.stats
    assert all(n in pool2.stats for n in pool2.sample_active())


def test_rating_history_roundtrip(tmp_path):
    h = RatingHistory(tmp_path)
    h.on_checkpoint_saved("step_00000100", 100)
    h.record_game("step_00000100", ["step_00000100"], [1, 2])
    h.on_checkpoint_saved("step_00000200", 200)
    for _ in range(5):
        h.record_game("step_00000200", ["step_00000100"], [1, 2])
    snap = h.compute()
    assert snap.total_games == 6

    h2 = RatingHistory.load(tmp_path)
    assert h2.num_games == 6
    assert h2.current_checkpoint == "step_00000200"
    snap2 = h2.compute()
    assert snap2.total_games == 6
    # later checkpoint that always wins rates above the anchored first
    assert snap2.best_elo >= 1000.0


def test_pool_training_e2e(tmp_path):
    """Full vs-pool training loop: checkpoints join the pool, rating
    games accumulate, opponent stats update (e2e.rs opponent tests)."""
    cfg = Config(
        env="connect_four",
        num_envs=8,
        num_steps=16,
        total_steps=1024,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=256,
        log_freq=128,
        seed=3,
        opponent_pool_fraction=0.5,
        max_active_opponents=2,
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    assert trainer.num_learner_envs == 4
    summary = trainer.train()
    assert summary["final_step"] >= 1024

    run = tmp_path / "run"
    assert (run / "opponent_stats.json").exists()
    assert (run / "rating_games.jsonl").exists()
    stats = json.loads((run / "opponent_stats.json").read_text())
    assert len(stats["opponents"]) >= 2
    games = (run / "rating_games.jsonl").read_text().splitlines()
    assert len(games) > 0
    # rating metrics logged
    lines = [json.loads(l) for l in (run / "metrics.jsonl").read_text().splitlines()]
    names = {l["name"] for l in lines if l["type"] == "scalar"}
    assert "train/current_elo" in names
    assert "eval/pool_performance" in names
    # best symlink exists (rating-driven for multiplayer)
    assert (run / "checkpoints" / "best").exists()


def test_debug_opponents_prints_selection(tmp_path, capsys):
    """--debug-opponents logs the rotation's picks with win rates and
    normalized selection probabilities (reference e2e.rs:1213)."""
    cfg = Config(
        env="connect_four",
        num_envs=8,
        num_steps=16,
        total_steps=768,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=256,
        log_freq=256,
        seed=5,
        opponent_pool_fraction=0.5,
        max_active_opponents=2,
        debug_opponents=True,
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=False)
    trainer.train()
    out = capsys.readouterr().out
    assert "[opponents @ step" in out
    assert "wr=" in out and "p=" in out


def test_rating_history_incremental_matches_cold_recompute(tmp_path):
    """The incremental comparison cache (chunks of ComparisonArrays) must
    reproduce a cold load that expands the full game log at once, across
    several append->checkpoint->compute cycles, including ties and
    multi-opponent games. The incremental path warm-starts the MM solve
    from the previous converged gammas — the PL MLE is a unique fixed
    point, so ratings agree within the convergence threshold (sub-0.01
    Elo), not bit-for-bit."""
    import numpy as np

    rng = np.random.default_rng(7)
    h = RatingHistory(tmp_path)
    names = [f"step_{i:08d}" for i in range(1, 7)]
    for ci, name in enumerate(names):
        h.on_checkpoint_saved(name, (ci + 1) * 100)
        games = []
        for _ in range(20):
            n_opp = int(rng.integers(1, 4))
            opps = [names[int(rng.integers(0, ci + 1))] for _ in range(n_opp)]
            placements = list(rng.integers(1, n_opp + 2, size=n_opp + 1))
            if rng.random() < 0.3:  # force ties regularly
                placements = [1] * (n_opp + 1)
            games.append((opps, placements))
        h.record_games_batch(name, games)
        snap_inc = h.compute()  # exercises the incremental path each cycle
        cold = RatingHistory.load(tmp_path)
        snap_cold = cold.compute()
        assert snap_inc.total_games == snap_cold.total_games
        assert abs(snap_inc.current_elo - snap_cold.current_elo) < 1e-2
        assert abs(snap_inc.best_elo - snap_cold.best_elo) < 1e-2
        assert snap_inc.best_step == snap_cold.best_step
        np.testing.assert_allclose(
            np.asarray(h._cached_ratings), np.asarray(cold._cached_ratings),
            atol=1e-2, rtol=0,
        )


def test_comparison_arrays_roundtrip():
    from burn_ppo_tpu.selfplay.plackett_luce import (
        GameResult,
        arrays_to_comparisons,
        comparisons_to_arrays,
        concat_comparison_arrays,
        expand_games_to_comparisons,
    )

    games = [
        GameResult.of([0, 1, 2], [1, 1, 3]),  # tie for first
        GameResult.of([2, 3], [2, 1]),
        GameResult.of([0, 1, 2, 3], [4, 3, 2, 1]),
    ]
    comps = expand_games_to_comparisons(games)
    arrays = comparisons_to_arrays(comps)
    back = arrays_to_comparisons(arrays)
    assert len(back) == len(comps)
    for a, b in zip(comps, back):
        assert a.winner == b.winner
        assert a.losers == b.losers
        assert a.weight == b.weight
    # chunked concat == single expansion
    half = comparisons_to_arrays(expand_games_to_comparisons(games[:1]))
    rest = comparisons_to_arrays(expand_games_to_comparisons(games[1:]))
    joined = concat_comparison_arrays([half, rest])
    import numpy as np

    np.testing.assert_array_equal(joined.winners, arrays.winners)
    np.testing.assert_array_equal(joined.counts, arrays.counts)
    np.testing.assert_array_equal(joined.losers, arrays.losers)
    np.testing.assert_array_equal(joined.weights, arrays.weights)


def test_seed_device_cache_matches_disk_load(tmp_path):
    """seed_device_cache must give the same rotation params as loading
    the checkpoint back from disk, and must deep-copy (caller buffers
    are donated)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_ppo_tpu.checkpoint import CheckpointManager, build_metadata
    from burn_ppo_tpu.envs import make_env
    from burn_ppo_tpu.models.network import make_network
    from burn_ppo_tpu.selfplay.opponent_pool import OpponentPool

    env = make_env("connect_four")
    net = make_network(env.spec, network_type="mlp", hidden_size=8,
                       num_hidden=1, activation="tanh")
    params = net.init(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(tmp_path)
    meta = build_metadata(
        step=64, env_name="connect_four", network=net, num_players=2,
        avg_return=0.0, best_avg_return=None, recent_returns=[],
        forked_from=None, rng_seed=0, normalize_obs=False,
        normalize_values=False,
    )
    path = ckpt.save(64, params, jax.tree_util.tree_map(jnp.zeros_like, params), {}, meta)

    pool = OpponentPool(tmp_path, seed=0)
    pool.add_checkpoint(path.name, 64)
    pool.seed_device_cache(path.name, params, None)
    seeded, _norm = pool._device_cache[path.name]
    fresh = OpponentPool(tmp_path, seed=0)
    loaded, _ = fresh._load_params_device(path.name)
    for a, b, orig in zip(jax.tree_util.tree_leaves(seeded),
                          jax.tree_util.tree_leaves(loaded),
                          jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a is not orig  # deep copy, not an alias


def test_rating_cache_persistence_roundtrip(tmp_path):
    """rating_cache.npz lets a new process (supervisor child) skip
    re-expanding the full game log: ratings after a cached load must
    match a cold load, including games appended AFTER the cache was
    written (tail re-parse) and a stale cache (truncated jsonl) must be
    ignored."""
    import numpy as np

    h = RatingHistory(tmp_path)
    names = [f"step_{i:08d}" for i in range(1, 5)]
    rng = np.random.default_rng(1)
    for ci, name in enumerate(names):
        h.on_checkpoint_saved(name, (ci + 1) * 100)
        games = []
        for _ in range(30):
            opp = names[int(rng.integers(0, ci + 1))]
            games.append(([opp], list(map(int, rng.permutation(2) + 1))))
        h.record_games_batch(name, games)
        h.compute()
    h._save_cache()
    h._cache_saved_upto = h._expanded_upto
    # tail games after the cache write
    h.record_games_batch(names[-1], [([names[0]], [1, 2])] * 10)

    cold = RatingHistory(tmp_path / "nocache")  # fresh dir trick not needed:
    cold = RatingHistory.load(tmp_path)
    assert cold._cache_saved_upto == 120  # cache actually used
    assert len(cold._pending) == 10  # only the tail past the cache parsed
    assert cold.num_games == 130
    s_cached = cold.compute()

    (tmp_path / "rating_cache.npz").unlink()
    full = RatingHistory.load(tmp_path)
    s_cold = full.compute()
    assert s_cached.total_games == s_cold.total_games == 130
    assert abs(s_cached.current_elo - s_cold.current_elo) < 1e-2
    assert abs(s_cached.best_elo - s_cold.best_elo) < 1e-2

    # stale cache: jsonl truncated below the watermark -> ignored
    full._save_cache()
    lines = (tmp_path / "rating_games.jsonl").read_text().splitlines()
    (tmp_path / "rating_games.jsonl").write_text("\n".join(lines[:50]) + "\n")
    stale = RatingHistory.load(tmp_path)
    assert stale._expanded_upto == 0
    assert stale.compute().total_games == 50


def test_stale_cache_reset_precedes_metadata_registration(tmp_path):
    """Stale rating cache (jsonl lost a tail write) + metadata present:
    the reset must happen BEFORE metadata registration.  The regression
    registered metadata names first, then wiped the index space, leaving
    first_checkpoint_idx pointing into a game-order rebuilt numbering —
    wrong Elo anchor (names flip when game order differs from metadata
    order) and all steps zeroed."""
    a, b = "step_00000100", "step_00000200"
    h = RatingHistory(tmp_path)
    h.on_checkpoint_saved(a, 100)
    h.on_checkpoint_saved(b, 200)
    # Game order starts with b: a late reset re-registers b at index 0.
    h.record_games_batch(b, [([a], [1, 2])] * 10)
    h.compute()
    h._save_cache()
    h._cache_saved_upto = h._expanded_upto
    lines = (tmp_path / "rating_games.jsonl").read_text().splitlines()
    (tmp_path / "rating_games.jsonl").write_text("\n".join(lines[:5]) + "\n")

    r = RatingHistory.load(tmp_path)
    assert r._expanded_upto == 0  # cache correctly discarded
    assert r.idx_to_checkpoint[r.first_checkpoint_idx] == a
    assert r.idx_to_step[r.checkpoint_to_idx[a]] == 100
    assert r.idx_to_step[r.checkpoint_to_idx[b]] == 200
    snap = r.compute()
    assert snap.total_games == 5
    # anchor: the first checkpoint rates exactly 1000
    assert abs(r._cached_ratings[r.checkpoint_to_idx[a]] - 1000.0) < 1e-6


def test_device_cache_sharding_canonical_between_seed_and_disk(tmp_path):
    """Seeded (live mesh-committed params) and disk-loaded device-cache
    entries must carry the SAME sharding: a rotation stacking a mix
    would otherwise flip the stacked tree's sharding between windows and
    recompile the pool-window program."""
    import jax
    import jax.numpy as jnp

    from burn_ppo_tpu.checkpoint import CheckpointManager, build_metadata
    from burn_ppo_tpu.envs import make_env
    from burn_ppo_tpu.models.network import make_network

    env = make_env("connect_four")
    net = make_network(env.spec, network_type="mlp", hidden_size=8,
                       num_hidden=1, activation="tanh")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    params = jax.device_put(net.init(jax.random.PRNGKey(0)), repl)
    ckpt = CheckpointManager(tmp_path)
    meta = build_metadata(
        step=64, env_name="connect_four", network=net, num_players=2,
        avg_return=0.0, best_avg_return=None, recent_returns=[],
        forked_from=None, rng_seed=0, normalize_obs=False,
        normalize_values=False,
    )
    path = ckpt.save(
        64, params, jax.tree_util.tree_map(jnp.zeros_like, params), {}, meta
    )
    pool = OpponentPool(
        tmp_path, seed=0, device_put_fn=lambda t: jax.device_put(t, repl)
    )
    pool.add_checkpoint(path.name, 64)
    pool.seed_device_cache(path.name, params, None)
    seeded, _ = pool._device_cache.pop(path.name)
    loaded, _ = pool._load_params_device(path.name)
    for s, l in zip(jax.tree_util.tree_leaves(seeded),
                    jax.tree_util.tree_leaves(loaded)):
        assert s.sharding == l.sharding, (s.sharding, l.sharding)
        assert s.sharding == repl


def test_pool_window_precompile_is_cache_hit(tmp_path):
    """The background warm-up must compile the SAME executable the real
    pool windows use: dummies carry the live leaves' committed shardings
    (the regression warmed uncommitted zeros — a guaranteed jit cache
    miss, so the first real window still compiled inline)."""
    import jax

    cfg = Config(
        env="connect_four",
        num_envs=8,
        num_steps=16,
        total_steps=1024,
        hidden_size=16,
        num_hidden=1,
        learning_rate=Schedule.constant(1e-3),
        checkpoint_freq=256,
        log_freq=256,
        seed=3,
        opponent_pool_fraction=0.5,
        max_active_opponents=2,
        pool_rotation_interval=2,
    )
    trainer = Trainer(cfg, tmp_path / "run", quiet=True)
    if not trainer.use_windows:
        import pytest

        pytest.skip("windows disabled on this platform")
    t = trainer._start_pool_window_precompile()
    assert t is not None
    t.join(timeout=300)
    assert not t.is_alive()
    pad_slots = max(cfg.max_active_opponents, 1)
    wf = trainer._get_pool_window(pad_slots, 2)
    assert wf._cache_size() == 1  # warm compiled exactly one entry
    trainer.train()
    # The real k=2 pool windows (pool active from step 256 on) must have
    # hit the warmed entry — any sharding mismatch would add a second.
    assert wf._cache_size() == 1


def test_warm_start_draws_only_checkpoint_matches_cold(tmp_path):
    """A checkpoint whose only games are DRAWS contributes zero
    comparisons, so the MM 'keep current' branch freezes whatever init
    it was handed. The warm start must therefore carry the solver's RAW
    gammas: the old rating-reconstructed warm start handed a zero-game
    player elo_to_gamma(1000) ~= -2.88 (its reported placeholder),
    which stuck forever and reported ~500 Elo below the reference's
    from-zero trajectory."""
    h = RatingHistory(tmp_path)
    h.on_checkpoint_saved("step_a", 100)
    h.on_checkpoint_saved("step_b", 200)
    h.record_games_batch("step_b", [(["step_a"], [1, 2])] * 10)
    h.compute()  # warm gammas now cover a+b
    h.on_checkpoint_saved("step_c", 300)
    h.compute()  # c rated with games_played == 0 -> placeholder 1000
    # c's only games are exact draws -> zero comparisons
    h.record_games_batch("step_c", [(["step_a"], [1, 1])] * 5)
    h.compute()
    cold = RatingHistory.load(tmp_path)
    cold.compute()
    warm = dict(zip(h.idx_to_checkpoint, h._cached_ratings))
    coldr = dict(zip(cold.idx_to_checkpoint, cold._cached_ratings))
    for name in ("step_a", "step_b", "step_c"):
        assert abs(warm[name] - coldr[name]) < 1e-2, (name, warm, coldr)


def test_load_without_metadata_anchors_earliest(tmp_path):
    """Metadata loss must fall back to anchoring the earliest registered
    player (rating_history.rs:145-146) — not let the next checkpoint
    save steal the anchor and rewrite every historical rating."""
    h = RatingHistory(tmp_path)
    h.on_checkpoint_saved("step_a", 100)
    h.on_checkpoint_saved("step_b", 200)
    h.record_games_batch("step_b", [(["step_a"], [1, 2])] * 10)
    h.compute()
    (tmp_path / "rating_metadata.json").unlink()
    h2 = RatingHistory.load(tmp_path)
    assert h2.first_checkpoint_idx == 0
    h2.on_checkpoint_saved("step_c", 300)
    assert h2.first_checkpoint_idx == 0  # anchor NOT stolen
    h2.compute()
    anchored = h2._cached_ratings[0]
    assert abs(anchored - 1000.0) < 1e-6
