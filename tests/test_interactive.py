"""Interactive web UI tests: drive the HTTP API (reference interactive.rs
session/handler behavior)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from burn_ppo_tpu.config import Config
from burn_ppo_tpu.train import Trainer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("skull_run")
    cfg = Config(
        env="skull", num_envs=2, num_steps=8, total_steps=32,
        hidden_size=16, num_hidden=1, checkpoint_freq=32, log_freq=32,
        seed=50, opponent_pool_fraction=0.0, player_count=4,
    )
    Trainer(cfg, d / "run", quiet=True).train()

    from burn_ppo_tpu.interactive import InteractiveApp, make_handler

    app = InteractiveApp([d / "run"], limit_per_run=1)
    globals()["_app"] = app  # direct session access for undo-semantics tests
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def call(base, path, body=None, sid="testsession"):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        base + path,
        data=data,
        headers={"x-session-id": sid, "content-type": "application/json"},
        method="POST" if body is not None else "GET",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_index_serves_html(server):
    with urllib.request.urlopen(server + "/") as r:
        html = r.read().decode()
    assert "Skull Assistant" in html


def test_networks_listed(server):
    r = call(server, "/api/networks")
    assert len(r["networks"]) == 1


def test_new_game_and_state(server):
    r = call(server, "/api/new_game", {"num_players": 3, "ai_seat": 1})
    assert r["ok"]
    state = r["state"]
    assert state["active"]
    assert len(state["players"]) == 3
    assert state["phase"] == "placing"
    assert state["players"][1]["is_ai"]


def test_execute_action_and_undo(server):
    call(server, "/api/new_game", {"num_players": 4, "ai_seat": 0})
    state = call(server, "/api/game_state")
    action = state["valid_actions"][0]["id"]
    r = call(server, "/api/execute_action", {"action": action})
    assert r.get("ok") or r.get("pending_discard")
    r2 = call(server, "/api/undo", {})
    assert r2["ok"]
    state2 = call(server, "/api/game_state")
    assert state2["current_player"] == 0


def test_invalid_action_rejected(server):
    call(server, "/api/new_game", {"num_players": 4, "ai_seat": 0})
    r = call(server, "/api/execute_action", {"action": 32})  # reveal P5: invalid
    assert "error" in r


def test_ai_probs_and_sample(server):
    call(server, "/api/new_game", {"num_players": 4, "ai_seat": 0})
    r = call(server, "/api/ai_probs", {})
    assert len(r["probs"]) >= 2
    total = sum(p["prob"] for p in r["probs"])
    assert 0.5 < total <= 1.001
    r2 = call(server, "/api/ai_sample", {})
    assert r2.get("ok")
    hist = call(server, "/api/history")
    assert len(hist["history"]) >= 1


def test_hide_private_info(server):
    call(server, "/api/new_game", {"num_players": 4, "ai_seat": 2})
    call(server, "/api/set_hide_info", {"hide": True})
    state = call(server, "/api/game_state")
    # non-AI seats hide skull/rose info; AI seat visible
    assert state["players"][0]["has_skull"] is None
    assert state["players"][2]["has_skull"] is not None
    call(server, "/api/set_hide_info", {"hide": False})


def test_sessions_isolated(server):
    call(server, "/api/new_game", {"num_players": 4, "ai_seat": 0}, sid="s1")
    state2 = call(server, "/api/game_state", sid="s2")
    assert not state2["active"]


def test_ai_probs_sum_to_one(server):
    call(server, "/api/new_game", {"num_players": 3, "ai_seat": 0}, sid="p1")
    r = call(server, "/api/ai_probs", {}, sid="p1")
    probs = r["probs"]
    total = sum(p["prob"] for p in probs)
    assert abs(total - 1.0) < 1e-3
    assert all(p["prob"] >= 0 for p in probs)


def test_illegal_action_has_zero_prob_or_absent(server):
    call(server, "/api/new_game", {"num_players": 3, "ai_seat": 0}, sid="p2")
    r = call(server, "/api/ai_probs", {}, sid="p2")
    # placing phase: pass (action 26) is illegal; it must not be suggested
    names = [p["label"] for p in r["probs"] if p["prob"] > 0]
    assert all("Pass" not in n for n in names)


def test_history_endpoint_tracks_actions(server):
    call(server, "/api/new_game", {"num_players": 3, "ai_seat": 1}, sid="p3")
    call(server, "/api/execute_action", {"action": 1}, sid="p3")  # place rose
    r = call(server, "/api/history", sid="p3")
    assert len(r["history"]) == 1
    assert "Rose" in r["history"][0]["action"]
    call(server, "/api/clear_history", {}, sid="p3")
    r = call(server, "/api/history", sid="p3")
    assert r["history"] == []


def test_set_ai_seat_roundtrip(server):
    call(server, "/api/new_game", {"num_players": 4, "ai_seat": 0}, sid="p4")
    call(server, "/api/set_ai_seat", {"seat": 2}, sid="p4")
    r = call(server, "/api/game_state", sid="p4")
    assert r["ai_seat"] == 2


def test_new_game_player_counts(server):
    for n in (2, 5):
        r = call(server, "/api/new_game", {"num_players": n, "ai_seat": 0},
                 sid=f"pc{n}")
        assert len(r["state"]["players"]) == n


def call_status(base, path, body=None, sid="testsession"):
    """Like call() but returns (status_code, json) without raising."""
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        base + path,
        data=data,
        headers={"x-session-id": sid, "content-type": "application/json"},
        method="POST" if body is not None else "GET",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_set_ai_seat_validates_range_and_types(server):
    call(server, "/api/new_game", {"num_players": 3, "ai_seat": 0})
    code, r = call_status(server, "/api/set_ai_seat", {"seat": 99})
    assert code == 400 and "seat" in r["error"]
    code, r = call_status(server, "/api/set_ai_seat", {"seat": "abc"})
    assert code == 400
    code, r = call_status(server, "/api/set_ai_seat", {"seat": None})
    assert code == 400
    code, r = call_status(server, "/api/set_ai_seat", {"seat": 2})
    assert code == 200 and r["ok"]


def test_malformed_post_fields_return_400(server):
    call(server, "/api/new_game", {"num_players": 3, "ai_seat": 0})
    code, _ = call_status(server, "/api/execute_action", {"action": "boom"})
    assert code == 400
    code, _ = call_status(server, "/api/select_network", {"index": None})
    assert code == 400


def test_undo_with_pending_discard_cancels_only(server):
    """Undo during a pending skull-reveal discard must cancel the prompt
    without popping the previous applied move (the pending reveal never
    pushed to the undo stack)."""
    sid = "undotest"
    call(server, "/api/new_game", {"num_players": 3, "ai_seat": 0}, sid=sid)
    state = call(server, "/api/game_state", sid=sid)
    action = state["valid_actions"][0]["id"]
    call(server, "/api/execute_action", {"action": action}, sid=sid)
    app = globals()["_app"]
    sess = app.sessions[sid]
    depth = len(sess.history)
    assert depth >= 1
    sess.pending_discard = {"action": 0, "bidder": 0}
    r = call(server, "/api/undo", {}, sid=sid)
    assert r["ok"]
    assert app.sessions[sid].pending_discard is None
    assert len(app.sessions[sid].history) == depth  # nothing popped
    # A second undo now pops the real move.
    r = call(server, "/api/undo", {}, sid=sid)
    assert r["ok"]
    assert len(app.sessions[sid].history) == depth - 1
