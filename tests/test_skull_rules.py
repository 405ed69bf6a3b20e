"""Extended Skull rule tests: placements ordering, final-reward formula
with tie averaging, mask edge cases, round-starter rules, history
encoding (reference skull.rs has 57 in-module tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.envs.skull import (
    A,
    BID_BASE,
    CARDS,
    MAX_BID,
    PASS,
    PLACE_ROSE,
    PLACE_SKULL,
    REVEAL_BASE,
    SKULL_C,
    Skull,
)


@pytest.fixture(scope="module")
def env():
    e = make_env("skull")
    # jit once: eager lax.cond trees are very slow per step on CPU
    e.step = jax.jit(e.step)
    e.action_mask = jax.jit(e.action_mask)
    return e


def fresh(env, seed=0):
    return env.reset(jax.random.PRNGKey(seed))


def BID(n):
    return jnp.asarray(BID_BASE + n - 1, jnp.int32)


def place_all_roses(env, s):
    """Each player places one rose in seat order starting from current."""
    for _ in range(env.n):
        s = env.step(s, jnp.asarray(PLACE_ROSE))
    return s


# ------------------------------------------------------- placements order
def test_placements_winner_first(env):
    s = fresh(env)
    s = s.replace(
        winner=jnp.asarray(2, jnp.int32),
        wins=jnp.zeros(6, jnp.int32).at[2].set(2),
        game_over=jnp.ones((), jnp.bool_),
    )
    places = np.asarray(env._placements(s))
    assert places[2] == 1


def test_placements_wins_beat_coasters(env):
    s = fresh(env)
    # P1 has 1 win but only 1 coaster; P0 has 0 wins and 4 coasters.
    s = s.replace(
        winner=jnp.asarray(3, jnp.int32),
        wins=jnp.zeros(6, jnp.int32).at[1].set(1).at[3].set(2),
        rose_count=jnp.asarray([3, 0, 3, 3, 0, 0], jnp.int32),
        has_trap=jnp.asarray([True, True, True, True, False, False]),
    )
    places = np.asarray(env._placements(s))
    assert places[3] == 1  # winner
    assert places[1] == 2  # 1 win beats any coaster count
    assert places[0] == 3  # more coasters than P2? equal -> tie
    assert places[2] == 3


def test_placements_elimination_order_breaks_ties(env):
    s = fresh(env)
    # P0 eliminated first (pos 0), P1 second (pos 1): later elim = better.
    s = s.replace(
        winner=jnp.asarray(3, jnp.int32),
        has_trap=jnp.asarray([False, False, True, True, False, False]),
        rose_count=jnp.asarray([0, 0, 3, 3, 0, 0], jnp.int32),
        elim_pos=jnp.asarray([0, 1, -1, -1, -1, -1], jnp.int32),
        num_eliminated=jnp.asarray(2, jnp.int32),
    )
    places = np.asarray(env._placements(s))
    assert places[3] < places[2] or places[3] == 1
    assert places[1] < places[0]  # eliminated later -> better placement


# ------------------------------------------------------- final rewards
def test_final_rewards_strict_ranking(env):
    s = fresh(env)
    s = s.replace(
        winner=jnp.asarray(0, jnp.int32),
        wins=jnp.asarray([2, 1, 0, 0, 0, 0], jnp.int32),
        rose_count=jnp.asarray([3, 3, 3, 0, 0, 0], jnp.int32),
        has_trap=jnp.asarray([True, True, True, False, False, False]),
        elim_pos=jnp.asarray([-1, -1, -1, 0, -1, -1], jnp.int32),
        num_eliminated=jnp.asarray(1, jnp.int32),
    )
    r = np.asarray(env._final_rewards(s))
    # reward = 1 - 2(p-1)/(n-1) for places 1..4 => [1, 1/3, -1/3, -1]
    np.testing.assert_allclose(r, [1.0, 1 / 3, -1 / 3, -1.0], atol=1e-6)


def test_final_rewards_tie_averaging(env):
    s = fresh(env)
    # P1 and P2 tie (same wins/coasters/not eliminated); winner P0.
    s = s.replace(
        winner=jnp.asarray(0, jnp.int32),
        wins=jnp.asarray([2, 0, 0, 0, 0, 0], jnp.int32),
        rose_count=jnp.asarray([3, 3, 3, 0, 0, 0], jnp.int32),
        has_trap=jnp.asarray([True, True, True, False, False, False]),
        elim_pos=jnp.asarray([-1, -1, -1, 0, -1, -1], jnp.int32),
        num_eliminated=jnp.asarray(1, jnp.int32),
    )
    r = np.asarray(env._final_rewards(s))
    # places [1, 2, 2, 4]: tied pair averages positions 2&3 -> eff 1.5
    expect_tied = 1.0 - 2.0 * 1.5 / 3.0
    np.testing.assert_allclose(r[1], expect_tied, atol=1e-6)
    np.testing.assert_allclose(r[2], expect_tied, atol=1e-6)
    assert r[0] == 1.0 and abs(r[3] + 1.0) < 1e-6
    # zero-sum-ish: rewards sum to 0 for 1..n placements with averaging
    np.testing.assert_allclose(r.sum(), 0.0, atol=1e-6)


def test_two_player_rewards(env):
    e = Skull(2)
    s = fresh(e)
    s = s.replace(winner=jnp.asarray(1, jnp.int32),
                  wins=jnp.zeros(6, jnp.int32).at[1].set(2))
    r = np.asarray(e._final_rewards(s))
    np.testing.assert_allclose(sorted(r), [-1.0, 1.0])


# ------------------------------------------------------- masks
def test_cannot_place_fifth_card(env):
    s = fresh(env)
    # P0 places all 4 cards (skull + 3 roses), coming back around 4 times
    for card in (PLACE_SKULL, PLACE_ROSE, PLACE_ROSE, PLACE_ROSE):
        for p in range(env.n):
            s = env.step(s, jnp.asarray(card if int(s.current) == 0 else PLACE_ROSE))
    assert int(s.stack_len[0]) == 4
    mask = np.asarray(env.action_mask(s))
    if int(s.current) == 0:
        assert not mask[PLACE_SKULL] and not mask[PLACE_ROSE]


def test_cannot_place_second_skull(env):
    s = fresh(env)
    s = env.step(s, jnp.asarray(PLACE_SKULL))  # P0 places skull
    for _ in range(env.n - 1):
        s = env.step(s, jnp.asarray(PLACE_ROSE))
    assert int(s.current) == 0
    mask = np.asarray(env.action_mask(s))
    assert not mask[PLACE_SKULL]  # skull already in own stack
    assert mask[PLACE_ROSE]


def test_bid_must_exceed_current(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(2))  # P0 bids 2
    mask = np.asarray(env.action_mask(s))
    assert not mask[int(BID(1))] and not mask[int(BID(2))]
    assert mask[int(BID(3))] and mask[int(BID(4))]
    assert not mask[int(BID(5))]  # only 4 cards placed
    assert mask[PASS]


def test_bid_capped_by_total_cards(env):
    s = place_all_roses(env, fresh(env))
    mask = np.asarray(env.action_mask(s))
    assert mask[int(BID(4))]
    assert not mask[int(BID(5))]


def test_reveal_mask_must_reveal_own_first(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(4))  # bid == total -> straight to reveal
    assert int(s.phase) == 2
    bidder = int(s.current_bidder)
    mask = np.asarray(env.action_mask(s))
    reveal = mask[REVEAL_BASE:]
    assert reveal[bidder]
    assert reveal.sum() == 1  # only own stack until exhausted


def test_reveal_mask_other_stacks_after_own(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(4))
    bidder = int(s.current_bidder)
    s = env.step(s, jnp.asarray(REVEAL_BASE + bidder))  # own rose
    mask = np.asarray(env.action_mask(s))
    reveal = mask[REVEAL_BASE:]
    assert not reveal[bidder]  # own stack exhausted (1 card)
    assert reveal.sum() == env.n - 1


def test_pass_unavailable_for_last_non_passed(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(1))  # P0 opens
    s = env.step(s, jnp.asarray(PASS))  # P1
    s = env.step(s, jnp.asarray(PASS))  # P2
    # P3 is now the last non-passed player -> if still bidding, they may
    # not pass (someone must challenge). Either the env already moved to
    # reveal (P0 is lone non-passed) or P3's pass is masked.
    if int(s.phase) == 1:
        mask = np.asarray(env.action_mask(s))
        if int(s.current) == 3:
            assert mask[int(BID(2))]


def test_mask_empty_never(env):
    """Every reachable state offers at least one action (utils.rs:115)."""
    key = jax.random.PRNGKey(42)
    s = fresh(env, seed=5)
    for _ in range(200):
        mask = np.asarray(env.action_mask(s))
        if bool(s.game_over):
            break
        assert mask.any()
        key, sub = jax.random.split(key)
        probs = mask / mask.sum()
        a = int(jax.random.choice(sub, A, p=jnp.asarray(probs)))
        s = env.step(s, jnp.asarray(a))


# ------------------------------------------------------- round flow
def test_failed_challenge_loses_coaster_and_skull_owner_starts(env):
    s = fresh(env)
    s = env.step(s, jnp.asarray(PLACE_SKULL))  # P0 skull
    for _ in range(env.n - 1):
        s = env.step(s, jnp.asarray(PLACE_ROSE))
    # P0 bids 2: must reveal own skull first -> immediate fail
    s = env.step(s, BID(2))
    # ... but P0 placed a skull; bidding continues among others first.
    # Drive to reveal: have everyone else pass.
    while int(s.phase) == 1:
        s = env.step(s, jnp.asarray(PASS))
    assert int(s.phase) == 2
    bidder = int(s.current_bidder)
    coasters_before = int(env._coasters(s)[bidder])
    s = env.step(s, jnp.asarray(REVEAL_BASE + bidder))  # own card
    if int(s.stack_len[bidder]) and int(s.stack[bidder * 4]) == SKULL_C:
        # new round started; bidder lost one coaster
        assert int(env._coasters(s)[bidder]) == coasters_before - 1
        assert int(s.phase) == 0


def test_successful_challenge_increments_wins(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(1))
    while int(s.phase) == 1:
        s = env.step(s, jnp.asarray(PASS))
    bidder = int(s.current_bidder)
    wins_before = int(s.wins[bidder])
    s = env.step(s, jnp.asarray(REVEAL_BASE + bidder))  # reveals own rose
    assert int(s.wins[bidder]) == wins_before + 1
    assert int(s.phase) == 0  # new round
    assert int(s.current) == bidder  # winner starts next round


def test_shaping_reward_on_success(env):
    s = place_all_roses(env, fresh(env))
    s = s.replace(shaping_coef=jnp.asarray(0.5, jnp.float32))
    s = env.step(s, BID(1))
    while int(s.phase) == 1:
        s = env.step(s, jnp.asarray(PASS))
    bidder = int(s.current_bidder)
    s = env.step(s, jnp.asarray(REVEAL_BASE + bidder))
    assert float(s.rewards[bidder]) == pytest.approx(0.5)


def test_shaping_penalty_on_failed_challenge(env):
    s = fresh(env)
    s = s.replace(shaping_coef=jnp.asarray(0.4, jnp.float32))
    s = env.step(s, jnp.asarray(PLACE_SKULL))
    for _ in range(env.n - 1):
        s = env.step(s, jnp.asarray(PLACE_ROSE))
    s = env.step(s, BID(2))
    while int(s.phase) == 1:
        s = env.step(s, jnp.asarray(PASS))
    bidder = int(s.current_bidder)
    if bidder == 0:  # own skull on top -> fails instantly
        s = env.step(s, jnp.asarray(REVEAL_BASE + bidder))
        assert float(s.rewards[bidder]) == pytest.approx(-0.4 / CARDS)


def test_history_records_pass_as_zero(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(1))
    s = env.step(s, jnp.asarray(PASS))
    h = np.asarray(s.hist[: int(s.hist_len)])
    assert h[0].tolist() == [0, 1]  # P0 bid 1
    assert h[1][1] == 0  # pass encoded as bid 0


def test_forced_discard_skull(env):
    """Interactive override: forced skull discard on failed challenge."""
    s = fresh(env)
    s = s.replace(forced_discard=jnp.asarray(0, jnp.int32))
    s = env.step(s, jnp.asarray(PLACE_SKULL))
    for _ in range(env.n - 1):
        s = env.step(s, jnp.asarray(PLACE_ROSE))
    s = env.step(s, BID(2))
    while int(s.phase) == 1:
        s = env.step(s, jnp.asarray(PASS))
    bidder = int(s.current_bidder)
    if bidder == 0:
        assert bool(s.has_trap[0])
        s = env.step(s, jnp.asarray(REVEAL_BASE + 0))
        assert not bool(s.has_trap[0])  # skull discarded, roses kept
        assert int(s.rose_count[0]) == 3


# ------------------------------------------------------- action text
def test_describe_and_parse_roundtrip(env):
    for a in range(A):
        text = env.describe_action(a)
        assert "Unknown" not in text
    assert env.parse_action("skull") == PLACE_SKULL
    assert env.parse_action("rose") == PLACE_ROSE
    assert env.parse_action("pass") == PASS
    assert env.parse_action("bid 5") == BID_BASE + 4
    assert env.parse_action("7") == BID_BASE + 6
    assert env.parse_action("reveal p2") == REVEAL_BASE + 2
    with pytest.raises(ValueError):
        env.parse_action("flip table")


def test_render_smoke(env):
    s = fresh(env)
    text = env.render(s)
    assert "Skull" in text and "Placing" in text


# ------------------------------------------------------- obs encoding
def test_obs_dims_and_range(env):
    s = fresh(env)
    o = np.asarray(env.obs(s))
    assert o.shape == (135,)
    assert np.all(o >= -1.0) and np.all(o <= 1.0)


def test_obs_own_hand_fresh(env):
    s = fresh(env)
    o = np.asarray(env.obs(s))
    # own hand: skull flag + 3 rose flags all present at reset
    assert o[:4].tolist() == [1.0, 1.0, 1.0, 1.0]
    # own stack empty
    assert o[4:8].tolist() == [0.0, 0.0, 0.0, 0.0]


def test_obs_phase_onehot_transitions(env):
    s = place_all_roses(env, fresh(env))
    o_placing = np.asarray(env.obs(fresh(env)))
    s = env.step(s, BID(1))
    o_bidding = np.asarray(env.obs(s))
    # layout: hand(4)+stack(4)+stack_sizes/coasters/alive/exists(4*6)+seat(6)
    base = 4 + 4 + 6 * 4 + 6
    assert o_placing[base:base + 3].tolist() == [1.0, 0.0, 0.0]
    assert o_bidding[base:base + 3].tolist() == [0.0, 1.0, 0.0]


def test_obs_player_count_onehot(env):
    from burn_ppo_tpu.envs.skull import Skull

    for n in (2, 4, 6):
        e = Skull(n)
        o = np.asarray(e.obs(e.reset(jax.random.PRNGKey(0))))
        # player-count one-hot (MAXP-1 wide) encodes n-2; offset =
        # 38 (through seat) + phase(3)+bid(1)+bidder(6)+passed(6)+wins(6)+revealed(6)
        seg = o[66:71]
        assert seg[n - 2] == 1.0
        assert seg.sum() == 1.0


def test_priv_obs_contains_true_skull_positions(env):
    s = fresh(env)
    s = env.step(s, jnp.asarray(PLACE_SKULL))
    p = np.asarray(env.privileged_obs(s))
    assert p.shape == (200,)
    assert np.isfinite(p).all()
    # the skulls-in-stack per-player block must show P0's hidden skull
    assert (p > 0).sum() > 5


def test_six_player_full_game_random(env):
    from burn_ppo_tpu.envs.skull import Skull, A as NA

    e = Skull(6)
    e.step = jax.jit(e.step)
    e.action_mask = jax.jit(e.action_mask)
    s = e.reset(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(11)
    for _ in range(600):
        if bool(s.game_over):
            break
        mask = np.asarray(e.action_mask(s)).astype(np.float64)
        key, sub = jax.random.split(key)
        a = int(jax.random.choice(sub, NA, p=jnp.asarray(mask / mask.sum())))
        s = e.step(s, jnp.asarray(a))
    assert bool(s.game_over)
    places = np.asarray(e._placements(s))
    assert places.min() == 1 and places.max() <= 6
    r = np.asarray(s.rewards)
    assert r.max() == pytest.approx(1.0) and r.min() == pytest.approx(-1.0)


def test_two_player_pass_masked_when_opponent_passed(env):
    from burn_ppo_tpu.envs.skull import Skull

    e = Skull(2)
    e.step = jax.jit(e.step)
    s = e.reset(jax.random.PRNGKey(0))
    s = e.step(s, jnp.asarray(PLACE_ROSE))
    s = e.step(s, jnp.asarray(PLACE_ROSE))
    s = e.step(s, BID(1))  # P0 opens
    # P1 is the only other player; if they pass, P0 must reveal
    s = e.step(s, jnp.asarray(PASS))
    assert int(s.phase) == 2
    assert int(s.current_bidder) == 0


def test_game_over_mask_empty(env):
    s = fresh(env)
    s = s.replace(game_over=jnp.ones((), jnp.bool_))
    mask = np.asarray(env.action_mask(s))
    assert not mask.any()


def test_step_after_game_over_is_terminal_noop(env):
    s = place_all_roses(env, fresh(env))
    s = env.step(s, BID(4))
    bidder = int(s.current_bidder)
    # drive to a win twice to end the game artificially
    s = s.replace(
        game_over=jnp.ones((), jnp.bool_), winner=jnp.asarray(bidder, jnp.int32)
    )
    s2 = env.step(s, jnp.asarray(PLACE_ROSE))
    assert bool(s2.done)
    assert float(np.abs(np.asarray(s2.rewards)).sum()) == 0.0


def test_invalid_action_terminates_like_liars_dice(env):
    """An unmasked action ends the episode with zero rewards (the
    liars_dice.apply_invalid contract; the reference panics) instead of
    being silently remapped by the phase arithmetic — PASS during the
    placing phase previously became a bid of 24."""
    s = fresh(env)
    mask = np.asarray(env.action_mask(s))
    assert not mask[PASS]  # placing phase: PASS is illegal
    s2 = env.step(s, jnp.asarray(PASS))
    assert bool(s2.done) and bool(s2.game_over)
    assert float(np.abs(np.asarray(s2.rewards)).sum()) == 0.0


def test_out_of_range_action_terminates_not_remapped(env):
    """Validity must come from the RAW action: clipping first would remap
    e.g. action=A (out of range) onto the last legal action id and
    silently play it (reference panics on action >= ACTION_COUNT,
    skull.rs:1116)."""
    from burn_ppo_tpu.envs.skull import A

    s = fresh(env)
    for bad in (A, A + 7, -1):
        s2 = env.step(s, jnp.asarray(bad))
        assert bool(s2.done) and bool(s2.game_over), bad
        assert float(np.abs(np.asarray(s2.rewards)).sum()) == 0.0
