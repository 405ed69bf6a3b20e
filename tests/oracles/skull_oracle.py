"""Plain-Python Skull rules oracle.

Written from the reference's executable rules spec
(/root/reference/src/envs/skull.rs) — NOT from the repo's JAX env — so
the two implementations are independent. Cited line numbers refer to
skull.rs. The one nondeterministic rule (the bidder's random coaster
loss, skull.rs:305-323) is injected: step() takes an explicit
``discard`` choice ('skull' | 'rose'), which the fuzz harness mirrors
into the JAX env's forced_discard field.
"""

MAXP = 6
CARDS = 4  # 3 roses + 1 skull (skull.rs:14)
ROSES = 3
MAX_BID = MAXP * CARDS  # 24
WINS_TO_WIN = 2

PLACE_SKULL = 0
PLACE_ROSE = 1
BID_BASE = 2  # bids 1-24 at indices 2-25
PASS_ACTION = BID_BASE + MAX_BID  # 26
REVEAL_BASE = PASS_ACTION + 1  # 27-32
ACTIONS = REVEAL_BASE + MAXP  # 33

BID_HISTORY_SIZE = 8
OBS_DIM = 135
PRIV_EXACT = 103
PRIV_DIM = 200


class SkullOracle:
    def __init__(self, num_players, shaping_coef=0.0):
        assert 2 <= num_players <= MAXP
        self.n = num_players
        self.rsc = float(shaping_coef)
        self.reset()

    # -- state (skull.rs:118-154) --------------------------------------
    def reset(self):
        n = self.n
        self.has_trap = [i < n for i in range(MAXP)]
        self.rose_count = [ROSES if i < n else 0 for i in range(MAXP)]
        self.wins = [0] * MAXP
        self.stack = [[] for _ in range(MAXP)]  # 'S' / 'R', bottom first
        self.passed = [False] * MAXP
        self.phase = "placing"
        self.current = 0
        self.round_starter = 0
        self.current_bid = 0
        self.current_bidder = None
        self.bid_history = []  # (player, bid); bid 0 = pass
        self.revealed = [0] * MAXP
        self.roses_found = 0
        self.must_reveal_own = False
        self.last_skull_owner = None
        self.elimination_order = []
        self.game_over = False
        self.winner = None

    # -- helpers (skull.rs:204-302) ------------------------------------
    def is_alive(self, p):
        return p < self.n and (self.has_trap[p] or self.rose_count[p] > 0)

    def coasters(self, p):
        if p >= self.n:
            return 0
        return int(self.has_trap[p]) + self.rose_count[p]

    def alive_count(self):
        return sum(1 for p in range(self.n) if self.is_alive(p))

    def next_alive(self, frm):
        nxt = (frm + 1) % self.n
        start = nxt
        while True:
            if self.is_alive(nxt):
                return nxt
            nxt = (nxt + 1) % self.n
            if nxt == start:
                return frm

    def next_non_passed(self, frm):
        nxt = (frm + 1) % self.n
        start = nxt
        while True:
            if self.is_alive(nxt) and not self.passed[nxt]:
                return nxt
            nxt = (nxt + 1) % self.n
            if nxt == start:
                return None

    def non_passed_count(self):
        return sum(
            1 for p in range(self.n) if self.is_alive(p) and not self.passed[p]
        )

    def total_cards(self):
        return sum(len(self.stack[p]) for p in range(self.n))

    def trap_in_hand(self, p):
        return self.has_trap[p] and "S" not in self.stack[p]

    def roses_in_hand(self, p):
        in_stack = sum(1 for c in self.stack[p] if c == "R")
        return max(self.rose_count[p] - in_stack, 0)

    def unrevealed(self, p):
        return max(len(self.stack[p]) - self.revealed[p], 0)

    def reveal_card(self, p):
        # Top unrevealed card = last placed minus already revealed
        # (skull.rs:293-302).
        idx = len(self.stack[p]) - 1 - self.revealed[p]
        card = self.stack[p][idx]
        self.revealed[p] += 1
        if card != "S":
            self.roses_found += 1
        return card == "S"

    def lose_coaster(self, p, choice):
        """Injected deterministic version of skull.rs:305-323 /
        lose_coaster_specified (skull.rs:327-361); the harness supplies a
        LEGAL choice so reference random and specified paths agree."""
        if self.coasters(p) == 0:
            return
        if choice == "skull":
            assert self.has_trap[p], "harness must supply a legal choice"
            self.has_trap[p] = False
        else:
            assert self.rose_count[p] > 0, "harness must supply a legal choice"
            self.rose_count[p] -= 1
        if self.coasters(p) == 0:
            self.elimination_order.append(p)

    def start_new_round(self, starter):
        # skull.rs:379-401
        for i in range(MAXP):
            self.stack[i] = []
            self.passed[i] = False
            self.revealed[i] = 0
        self.phase = "placing"
        self.current_bid = 0
        self.current_bidder = None
        self.bid_history = []
        self.roses_found = 0
        self.must_reveal_own = False
        self.last_skull_owner = None
        if self.is_alive(starter):
            self.current = starter
        else:
            self.current = self.next_alive(starter)
        self.round_starter = self.current

    # -- rewards & placements (skull.rs:406-529) -----------------------
    def placements(self):
        n = self.n
        elim_len = len(self.elimination_order)
        entries = []
        for p in range(n):
            elim_rank = (
                self.elimination_order.index(p)
                if p in self.elimination_order
                else elim_len
            )
            entries.append(
                (p, self.winner == p, self.wins[p], self.coasters(p), elim_rank)
            )
        entries.sort(key=lambda e: (e[1], e[2], e[3], e[4]), reverse=True)
        placements = [0] * n
        place, i = 1, 0
        while i < n:
            j = i + 1
            while j < n and entries[j][1:] == entries[i][1:]:
                j += 1
            for k in range(i, j):
                placements[entries[k][0]] = place
            place += j - i
            i = j
        return placements

    def final_rewards(self):
        n = self.n
        placements = self.placements()
        groups = {}
        for p, pl in enumerate(placements):
            groups.setdefault(pl, []).append(p)
        rewards = [0.0] * n
        for pl, players in groups.items():
            size = len(players)
            total = sum(
                1.0 - 2.0 * (pl + off - 1.0) / (n - 1.0) if n > 1 else 0.0
                for off in range(size)
            )
            for p in players:
                rewards[p] = total / size
        return rewards

    def round_rewards(self, success, bidder):
        rewards = [0.0] * self.n
        if self.rsc > 0.0:
            if success:
                rewards[bidder] += self.rsc
            else:
                rewards[bidder] -= 1.0 / CARDS * self.rsc
        return rewards

    # -- mask (skull.rs:1254-1336) --------------------------------------
    def action_mask(self):
        mask = [False] * ACTIONS
        if self.game_over:
            return mask
        p = self.current
        if self.phase == "placing":
            if self.trap_in_hand(p):
                mask[PLACE_SKULL] = True
            if self.roses_in_hand(p) > 0:
                mask[PLACE_ROSE] = True
            if self.stack[p]:
                total = self.total_cards()
                min_bid = max(self.current_bid + 1, 1)
                for bid in range(min_bid, total + 1):
                    mask[BID_BASE + bid - 1] = True
        elif self.phase == "bidding":
            total = self.total_cards()
            for bid in range(self.current_bid + 1, total + 1):
                mask[BID_BASE + bid - 1] = True
            if not self.passed[p] and self.non_passed_count() > 1:
                mask[PASS_ACTION] = True
        else:  # revealing
            bidder = self.current_bidder
            if p == bidder:
                if self.must_reveal_own and self.unrevealed(bidder) > 0:
                    mask[REVEAL_BASE + bidder] = True
                else:
                    if self.unrevealed(bidder) > 0:
                        mask[REVEAL_BASE + bidder] = True
                    for q in range(self.n):
                        if q != bidder and self.unrevealed(q) > 0:
                            mask[REVEAL_BASE + q] = True
        return mask

    # -- phase transitions (skull.rs:673-720) ---------------------------
    def to_bidding(self, bidder, bid):
        self.phase = "bidding"
        self.current_bid = bid
        self.current_bidder = bidder
        self.bid_history.append((bidder, bid))
        if bid == self.total_cards():
            self.to_revealing()
        else:
            nxt = self.next_non_passed(bidder)
            if nxt is not None:
                self.current = nxt
            else:
                self.check_bidding_end()

    def to_revealing(self):
        self.phase = "revealing"
        self.current = self.current_bidder
        self.must_reveal_own = True
        self.roses_found = 0
        self.revealed = [0] * MAXP

    def check_bidding_end(self):
        if self.non_passed_count() == 1:
            bidder = next(
                p
                for p in range(self.n)
                if self.is_alive(p) and not self.passed[p]
            )
            self.current_bidder = bidder
            self.to_revealing()
        else:
            nxt = self.next_non_passed(self.current)
            if nxt is not None:
                self.current = nxt

    # -- step (skull.rs:1103-1252) ----------------------------------------
    def step(self, action, discard=None):
        """Returns (rewards, done). ``discard`` must be a legal
        'skull'/'rose' whenever a skull reveal is possible this step."""
        rewards = [0.0] * self.n
        if self.game_over:
            return rewards, True
        assert self.action_mask()[action], "oracle fed an invalid action"
        p = self.current
        if self.phase == "placing":
            if action == PLACE_SKULL:
                self.stack[p].append("S")
                self.current = self.next_alive(p)
            elif action == PLACE_ROSE:
                self.stack[p].append("R")
                self.current = self.next_alive(p)
            else:
                self.to_bidding(p, action - BID_BASE + 1)
        elif self.phase == "bidding":
            if BID_BASE <= action < PASS_ACTION:
                bid = action - BID_BASE + 1
                self.current_bid = bid
                self.current_bidder = p
                if len(self.bid_history) >= BID_HISTORY_SIZE:
                    self.bid_history.pop(0)
                self.bid_history.append((p, bid))
                if bid == self.total_cards():
                    self.to_revealing()
                else:
                    nxt = self.next_non_passed(p)
                    if nxt is not None:
                        self.current = nxt
                    else:
                        self.check_bidding_end()
            else:  # pass
                self.passed[p] = True
                if len(self.bid_history) >= BID_HISTORY_SIZE:
                    self.bid_history.pop(0)
                self.bid_history.append((p, 0))
                self.check_bidding_end()
        else:  # revealing
            bidder = self.current_bidder
            target = action - REVEAL_BASE
            is_skull = self.reveal_card(target)
            if target == bidder and self.unrevealed(bidder) == 0:
                self.must_reveal_own = False
            if is_skull:
                self.last_skull_owner = target
                self.lose_coaster(bidder, discard)
                rewards = self.round_rewards(False, bidder)
                if self.alive_count() <= 1:
                    self.game_over = True
                    self.winner = next(
                        (q for q in range(self.n) if self.is_alive(q)), None
                    )
                    rewards = self.final_rewards()
                else:
                    if self.is_alive(bidder):
                        starter = bidder
                    elif self.is_alive(target):
                        starter = target
                    else:
                        starter = self.next_alive(target)
                    self.start_new_round(starter)
            elif self.roses_found >= self.current_bid:
                self.wins[bidder] += 1
                rewards = self.round_rewards(True, bidder)
                if self.wins[bidder] >= WINS_TO_WIN or self.alive_count() == 1:
                    self.game_over = True
                    self.winner = bidder
                    rewards = self.final_rewards()
                else:
                    self.start_new_round(bidder)
            # else: bidder keeps revealing
        return rewards, self.game_over

    # -- observation (skull.rs:533-670) -----------------------------------
    def observation(self):
        obs = [0.0] * OBS_DIM
        p, n = self.current, self.n
        idx = 0
        # own hand
        obs[idx] = 1.0 if self.trap_in_hand(p) else 0.0
        rih = self.roses_in_hand(p)
        for i in range(ROSES):
            obs[idx + 1 + i] = 1.0 if i < rih else 0.0
        idx += CARDS
        # own stack (bottom-first, skull=1)
        for i, c in enumerate(self.stack[p]):
            obs[idx + i] = 1.0 if c == "S" else 0.0
        idx += CARDS
        # stack sizes (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = len(self.stack[(r + p) % n]) / CARDS
        idx += MAXP
        # coasters (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = self.coasters((r + p) % n) / CARDS
        idx += MAXP
        # alive flags (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = 1.0 if self.is_alive((r + p) % n) else 0.0
        idx += MAXP
        # exists flags (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = 1.0
        idx += MAXP
        # seat one-hot (absolute)
        obs[idx + p] = 1.0
        idx += MAXP
        # phase one-hot
        obs[idx + {"placing": 0, "bidding": 1, "revealing": 2}[self.phase]] = 1.0
        idx += 3
        # current bid
        obs[idx] = self.current_bid / MAX_BID
        idx += 1
        # bidder one-hot (relative)
        if self.current_bidder is not None:
            obs[idx + (self.current_bidder + n - p) % n] = 1.0
        idx += MAXP
        # passed (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = 1.0 if self.passed[(r + p) % n] else 0.0
        idx += MAXP
        # wins (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = self.wins[(r + p) % n] / WINS_TO_WIN
        idx += MAXP
        # revealed (relative)
        for r in range(MAXP):
            if r < n:
                obs[idx + r] = self.revealed[(r + p) % n] / CARDS
        idx += MAXP
        # num players one-hot
        obs[idx + n - 2] = 1.0
        idx += MAXP - 1
        # bid history, oldest first (skull.rs:658-667)
        for i, (player, bid) in enumerate(self.bid_history):
            base = idx + i * (MAXP + 2)
            obs[base + (player + n - p) % n] = 1.0
            if bid == 0:
                obs[base + MAXP + 1] = 1.0
            else:
                obs[base + MAXP] = bid / MAX_BID
        return obs

    # -- privileged obs (skull.rs:1480-1577) -------------------------------
    def privileged_obs(self):
        g = []
        g += {
            "placing": [1.0, 0.0, 0.0],
            "bidding": [0.0, 1.0, 0.0],
            "revealing": [0.0, 0.0, 1.0],
        }[self.phase]
        g.append(self.current / MAXP)
        g.append(self.round_starter / MAXP)
        if self.current_bid > 0:
            g.append(self.current_bid / MAX_BID)
            g.append(
                self.current_bidder / MAXP
                if self.current_bidder is not None
                else -1.0
            )
        else:
            g += [0.0, -1.0]
        # last 10 bids, NEWEST first (skull.rs:1517-1529)
        hist = list(reversed(self.bid_history))[:10]
        for player, bid in hist:
            g += [player / MAXP, bid / MAX_BID, 1.0 if bid == 0 else 0.0]
        g += [0.0, 0.0, 0.0] * (10 - len(hist))
        g.append(1.0 if self.game_over else 0.0)
        for i in range(2, MAXP + 1):
            g.append(1.0 if self.n == i else 0.0)
        for seat in range(MAXP):
            g.append(1.0 if seat < self.n else 0.0)
            g.append(self.wins[seat] / WINS_TO_WIN)
            alive = self.has_trap[seat] or self.rose_count[seat] > 0
            g.append(1.0 if alive else 0.0)
            g.append(1.0 if self.has_trap[seat] else 0.0)
            g.append(self.rose_count[seat] / ROSES)
            g.append(len(self.stack[seat]) / CARDS)
            g.append(sum(1 for c in self.stack[seat] if c == "S") / CARDS)
            g.append(sum(1 for c in self.stack[seat] if c == "R") / CARDS)
            g.append(1.0 if self.passed[seat] else 0.0)
            g.append(self.revealed[seat] / CARDS)
        assert len(g) == PRIV_EXACT
        return g + [0.0] * (PRIV_DIM - len(g))
