"""Plain-Python Connect Four rules oracle.

Written from the reference's executable rules spec
(/root/reference/src/envs/connect_four.rs) — NOT from the repo's JAX
env. Cited line numbers refer to connect_four.rs. Fully deterministic
(no injected randomness needed)."""

ROWS, COLS, WIN = 6, 7, 4
OBS_DIM = ROWS * COLS * 2 + 2  # 86


class ConnectFourOracle:
    def __init__(self):
        self.reset()

    def reset(self):
        self.board = [[0] * COLS for _ in range(ROWS)]  # 0 empty, 1/2
        self.current = 0  # player index 0/1
        self.game_over = False
        self.winner = None  # None / 0 / 1 / "draw"

    # -- helpers (connect_four.rs:105-180) --------------------------------
    def drop_piece(self, col, piece):
        for row in range(ROWS - 1, -1, -1):
            if self.board[row][col] == 0:
                self.board[row][col] = piece
                return row
        return None

    def check_winner(self, row, col, piece):
        for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
            count = 1
            for sign in (1, -1):
                for i in range(1, WIN):
                    r, c = row + dr * i * sign, col + dc * i * sign
                    if not (0 <= r < ROWS and 0 <= c < COLS):
                        break
                    if self.board[r][c] == piece:
                        count += 1
                    else:
                        break
            if count >= WIN:
                return True
        return False

    def is_full(self):
        return all(self.board[0][c] != 0 for c in range(COLS))

    # -- step (connect_four.rs:249-283) ------------------------------------
    def step(self, action):
        rewards = [0.0, 0.0]
        cur, other = self.current, 1 - self.current
        if action >= COLS or self.board[0][action] != 0 or self.game_over:
            self.game_over = True
            return rewards, True
        row = self.drop_piece(action, cur + 1)
        if row is not None and self.check_winner(row, action, cur + 1):
            self.game_over = True
            self.winner = cur
            rewards[cur] = 1.0
            rewards[other] = -1.0
            return rewards, True
        if self.is_full():
            self.game_over = True
            self.winner = "draw"
            return rewards, True
        self.current = other
        return rewards, False

    def action_mask(self):
        # connect_four.rs:289-295 ignores game_over; the fuzz only
        # compares masks on live states, matching both implementations.
        return [self.board[0][c] == 0 for c in range(COLS)]

    def placements(self):
        # connect_four.rs:301-310
        if self.winner == 0:
            return [1, 2]
        if self.winner == 1:
            return [2, 1]
        return [1, 1]

    def observation(self):
        # connect_four.rs:186-206: P0 plane, P1 plane, turn one-hot.
        obs = [0.0] * OBS_DIM
        for r in range(ROWS):
            for c in range(COLS):
                v = self.board[r][c]
                if v == 1:
                    obs[r * COLS + c] = 1.0
                elif v == 2:
                    obs[ROWS * COLS + r * COLS + c] = 1.0
        obs[ROWS * COLS * 2 + self.current] = 1.0
        return obs

    def observation_channels_last(self):
        """The repo's documented layout deviation (docs/DESIGN.md): the
        same 86 features with the board section stored (row, col,
        channel)-interleaved instead of plane-major — the fixed
        permutation repo_obs[(r*COLS+c)*2+ch] = ref_obs[ch*42+r*COLS+c];
        turn indicator unchanged at the end."""
        ref = self.observation()
        out = [0.0] * OBS_DIM
        for r in range(ROWS):
            for c in range(COLS):
                for ch in range(2):
                    out[(r * COLS + c) * 2 + ch] = ref[ch * ROWS * COLS + r * COLS + c]
        out[ROWS * COLS * 2] = ref[ROWS * COLS * 2]
        out[ROWS * COLS * 2 + 1] = ref[ROWS * COLS * 2 + 1]
        return out
