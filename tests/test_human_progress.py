"""Human input loop + progress display tests (reference src/human.rs,
src/progress.rs)."""

import io

import jax
import numpy as np
import pytest

from burn_ppo_tpu.envs import make_env
from burn_ppo_tpu.human import prompt_human_action, random_valid_action
from burn_ppo_tpu.progress import TrainingProgress


@pytest.fixture()
def c4():
    env = make_env("connect_four")
    state = env.reset(jax.random.PRNGKey(0))
    return env, state


def feed(monkeypatch, lines):
    it = iter(lines)
    monkeypatch.setattr("builtins.input", lambda *_: next(it))


# ------------------------------------------------------- human prompt
def test_random_valid_action_respects_mask(c4):
    env, state = c4
    for _ in range(20):
        a = random_valid_action(env, state)
        assert bool(np.asarray(env.action_mask(state))[a])


def test_prompt_parses_action(c4, monkeypatch):
    env, state = c4
    feed(monkeypatch, ["4"])  # column 4 (1-indexed in c4 parse)
    a = prompt_human_action(env, state)
    assert 0 <= a < env.spec.num_actions


def test_prompt_rejects_illegal_then_accepts(c4, monkeypatch, capsys):
    env, state = c4
    # fill column 0
    for _ in range(6):
        state = env.step(state, np.int32(0))
    feed(monkeypatch, ["1", "2"])  # col 1 is full -> rejected; col 2 ok
    a = prompt_human_action(env, state)
    out = capsys.readouterr().out
    assert "not legal" in out
    assert a == 1  # "2" parses to column index 1


def test_prompt_help_render_then_move(c4, monkeypatch, capsys):
    env, state = c4
    feed(monkeypatch, ["help", "render", "nonsense", "1"])
    a = prompt_human_action(env, state)
    out = capsys.readouterr().out
    assert "Commands" in out
    assert "invalid input" in out
    assert a == 0


def test_prompt_random_command(c4, monkeypatch, capsys):
    env, state = c4
    feed(monkeypatch, ["random"])
    a = prompt_human_action(env, state)
    assert bool(np.asarray(env.action_mask(state))[a])
    assert "(random)" in capsys.readouterr().out


def test_prompt_quit_exits(c4, monkeypatch):
    env, state = c4
    feed(monkeypatch, ["quit"])
    with pytest.raises(SystemExit):
        prompt_human_action(env, state)


def test_prompt_hint_without_model(c4, monkeypatch, capsys):
    env, state = c4
    feed(monkeypatch, ["hint", "1"])
    prompt_human_action(env, state, hint_source=None)
    assert "no model" in capsys.readouterr().out


# ------------------------------------------------------- progress bar
def test_progress_line_contents():
    buf = io.StringIO()
    p = TrainingProgress(1000, stream=buf)
    p.update(500, sps=1234.0, avg_return=42.5)
    out = buf.getvalue()
    assert "50.0%" in out
    assert "1,234 sps" in out
    assert "42.50" in out


def test_progress_multiplayer_line():
    buf = io.StringIO()
    p = TrainingProgress(100, stream=buf)
    p.update_multiplayer(50, 10.0, [1.5, 1.2, 0.8, 0.5], 0.05, elo=1042.0)
    out = buf.getvalue()
    assert "1.50/1.20/0.80/0.50" in out
    assert "5.0%" in out  # draw rate
    assert "elo 1042" in out


def test_progress_quiet_suppresses():
    buf = io.StringIO()
    p = TrainingProgress(100, quiet=True, stream=buf)
    p.update(10, 1.0, 0.0)
    p.println("msg")
    p.finish()
    assert buf.getvalue() == ""


def test_progress_elapsed_offset_carries():
    buf = io.StringIO()
    p = TrainingProgress(100, elapsed_offset=3600.0, stream=buf)
    p.update(10, 1.0, 0.0)
    assert "1h" in buf.getvalue()  # supervisor child carries parent time


def test_progress_finish_messages():
    buf = io.StringIO()
    p = TrainingProgress(100, stream=buf)
    p.finish_interrupted()
    assert "--resume" in buf.getvalue()


def test_progress_println_redraws_bar_on_tty():
    """println must redraw the live bar beneath the message (indicatif
    semantics, progress.rs): without the redraw the bar vanishes until
    the next update and finish() emits a newline for a bar line that no
    longer exists."""

    class TtyBuf(io.StringIO):
        def isatty(self):
            return True

    buf = TtyBuf()
    p = TrainingProgress(1000, stream=buf)
    p.update(500, sps=1234.0, avg_return=42.5)
    p.println("saved checkpoint")
    out = buf.getvalue()
    # message printed, then the bar line re-rendered after it
    assert "saved checkpoint" in out
    tail = out.split("saved checkpoint")[-1]
    assert "50.0%" in tail
    p.finish("done")
    assert "done" in buf.getvalue()
