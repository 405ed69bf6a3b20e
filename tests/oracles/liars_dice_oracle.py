"""Plain-Python Liar's Dice rules oracle.

Written from the reference's executable rules spec
(/root/reference/src/envs/liars_dice.rs) — NOT from the repo's JAX env —
so the two implementations are independent. Cited line numbers refer to
liars_dice.rs. The one nondeterministic rule (dice rolls,
liars_dice.rs:191-197) is injected: the harness reads the JAX env's dice
and hands them to the oracle via reset(dice)/step(..., next_dice).
"""

P = 4
DICE = 2
FACES = 6
MAX_TOTAL = P * DICE  # 8
ACTIONS = MAX_TOTAL * FACES + 1  # 49
CALL_LIAR = ACTIONS - 1  # 48
HIST = 16
OBS_DIM = 270
PRIV_EXACT = 110
PRIV_DIM = 120


def decode(action):
    # liars_dice.rs:74-82
    if action == CALL_LIAR:
        return None
    return action // FACES + 1, action % FACES + 1  # (quantity, face)


def encode(quantity, face):
    return (quantity - 1) * FACES + (face - 1)


class LiarsDiceOracle:
    def __init__(self, dice, shaping_coef=0.0):
        self.rsc = float(shaping_coef)
        self.reset(dice)

    def reset(self, dice):
        """``dice``: [P][DICE] face values 1-6 (the injected roll)."""
        self.dice = [list(row) for row in dice]
        self.dice_count = [DICE] * P
        self.current = 0
        self.current_bid = None  # (quantity, face)
        self.last_bidder = None
        self.bid_count = 0
        self.bid_history = []  # (bidder, quantity, face), ring of 16
        self.elimination_order = []
        self.game_over = False

    # -- helpers (liars_dice.rs:200-263) ---------------------------------
    def total_dice(self):
        return sum(self.dice_count)

    def alive_players(self):
        return sum(1 for c in self.dice_count if c > 0)

    def count_dice(self, face):
        # Wild 1s: for faces 2-6, 1s count; for face 1, only 1s
        # (liars_dice.rs:211-230).
        count = 0
        for p in range(P):
            for d in range(self.dice_count[p]):
                v = self.dice[p][d]
                if face == 1:
                    count += v == 1
                else:
                    count += v == face or v == 1
        return count

    def is_valid_bid(self, quantity, face):
        if quantity == 0 or quantity > self.total_dice():
            return False
        if face == 0 or face > FACES:
            return False
        if self.current_bid is None:
            return True
        cq, cf = self.current_bid
        return quantity > cq or (quantity == cq and face > cf)

    def next_alive(self, frm):
        nxt = (frm + 1) % P
        while self.dice_count[nxt] == 0:
            nxt = (nxt + 1) % P
            if nxt == frm:
                break
        return nxt

    def start_new_round(self, loser, next_dice):
        # liars_dice.rs:266-305
        if self.dice_count[loser] > 0:
            self.dice_count[loser] -= 1
        if self.dice_count[loser] == 0:
            self.elimination_order.append(loser)
        if self.alive_players() <= 1:
            self.game_over = True
            for p in range(P):
                if self.dice_count[p] > 0:
                    self.elimination_order.append(p)
                    break
            return
        self.current_bid = None
        self.last_bidder = None
        self.bid_count = 0
        self.bid_history = []
        if self.dice_count[loser] > 0:
            self.current = loser
        else:
            self.current = self.next_alive(loser)
        self.dice = [list(row) for row in next_dice]

    # -- step (liars_dice.rs:481-551) -------------------------------------
    def step(self, action, next_dice=None):
        """Returns (rewards, done). ``next_dice`` must be supplied when
        the action is a call (a reroll may happen)."""
        rewards = [0.0] * P
        if self.game_over or self.dice_count[self.current] == 0:
            return rewards, True
        decoded = decode(action)
        if decoded is not None:
            quantity, face = decoded
            assert self.is_valid_bid(quantity, face), "oracle fed invalid bid"
            if len(self.bid_history) >= HIST:
                self.bid_history.pop(0)
            self.bid_history.append((self.current, quantity, face))
            self.current_bid = (quantity, face)
            self.last_bidder = self.current
            self.bid_count += 1
            self.current = self.next_alive(self.current)
            return rewards, False
        # Call liar
        assert self.current_bid is not None, "oracle fed call with no bid"
        bid_qty, bid_face = self.current_bid
        actual = self.count_dice(bid_face)
        caller_correct = actual < bid_qty
        caller, bidder = self.current, self.last_bidder
        loser = bidder if caller_correct else caller
        self.start_new_round(loser, next_dice)
        for p in range(P):
            if self.dice_count[p] > 0:
                rewards[p] += self.rsc
        if self.game_over:
            placement_rewards = [1.0, 0.33, -0.33, -1.0]
            for order, player in enumerate(self.elimination_order):
                placement = P - order  # order 0 -> 4th, 3 -> 1st
                rewards[player] = placement_rewards[placement - 1]
        return rewards, self.game_over

    # -- mask (liars_dice.rs:557-580) ---------------------------------------
    def action_mask(self):
        mask = [False] * ACTIONS
        if self.dice_count[self.current] == 0 or self.game_over:
            return mask
        mask[CALL_LIAR] = self.current_bid is not None
        for q in range(1, self.total_dice() + 1):
            for f in range(1, FACES + 1):
                if self.is_valid_bid(q, f):
                    mask[encode(q, f)] = True
        return mask

    def placements(self):
        # liars_dice.rs:586-601
        placements = [0] * P
        for order, player in enumerate(self.elimination_order):
            placements[player] = P - order
        return placements

    # -- observation (liars_dice.rs:309-374) ---------------------------------
    def observation(self):
        obs = [0.0] * OBS_DIM
        cur = self.current
        # own dice one-hot (only the first dice_count dice)
        for d in range(self.dice_count[cur]):
            obs[d * FACES + self.dice[cur][d] - 1] = 1.0
        idx = DICE * FACES
        # dice counts (relative)
        for r in range(P):
            obs[idx + r] = self.dice_count[(r + cur) % P] / DICE
        idx += P
        # alive flags (relative)
        for r in range(P):
            obs[idx + r] = 1.0 if self.dice_count[(r + cur) % P] > 0 else 0.0
        idx += P
        # seat one-hot (absolute)
        obs[idx + cur] = 1.0
        idx += P
        # current bid one-hot
        if self.current_bid is not None:
            obs[idx + encode(*self.current_bid)] = 1.0
        idx += MAX_TOTAL * FACES
        # has bid
        obs[idx] = 1.0 if self.current_bid is not None else 0.0
        idx += 1
        # bid count (normalized, capped)
        obs[idx] = min(self.bid_count / 20.0, 1.0)
        idx += 1
        # last bidder one-hot (relative)
        if self.last_bidder is not None:
            obs[idx + (self.last_bidder + P - cur) % P] = 1.0
        idx += P
        # bid history, oldest first (liars_dice.rs:116-137)
        for i, (bidder, quantity, face) in enumerate(self.bid_history):
            base = idx + i * (P + 1 + FACES + 1)
            obs[base + (bidder + P - cur) % P] = 1.0
            obs[base + P] = quantity / MAX_TOTAL
            obs[base + P + 1 + face - 1] = 1.0
            obs[base + P + 1 + FACES] = 1.0  # valid flag
        return obs

    # -- privileged obs (liars_dice.rs:639-719) --------------------------------
    def privileged_obs(self):
        g = [self.current / P]
        if self.current_bid is not None:
            g += [self.current_bid[0] / MAX_TOTAL, self.current_bid[1] / FACES]
        else:
            g += [0.0, 0.0]
        g.append(self.last_bidder / P if self.last_bidder is not None else -1.0)
        g.append(self.bid_count / (P * 3))
        # last 16 bids, NEWEST first (liars_dice.rs:670-682)
        hist = list(reversed(self.bid_history))[:HIST]
        for bidder, quantity, face in hist:
            g += [bidder / P, quantity / MAX_TOTAL, face / FACES]
        g += [0.0, 0.0, 0.0] * (HIST - len(hist))
        g.append(1.0 if self.game_over else 0.0)
        for seat in range(P):
            g.append(self.dice_count[seat] / DICE)
            g.append(1.0 if self.dice_count[seat] > 0 else 0.0)
            for d in range(DICE):
                if d < self.dice_count[seat]:
                    for face in range(1, FACES + 1):
                        g.append(1.0 if self.dice[seat][d] == face else 0.0)
                else:
                    g += [0.0] * FACES
        assert len(g) == PRIV_EXACT
        return g + [0.0] * (PRIV_DIM - len(g))
