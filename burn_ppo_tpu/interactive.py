"""Interactive web UI: a Skull game assistant.

Parity with the reference `interactive` subcommand (src/interactive.rs):
an embedded single-page web app backed by a JSON API for assisting a
physical Skull game — per-tab sessions (x-session-id header), network
selection, AI seat, action probabilities, AI sampling, undo stack,
hidden-information toggle, discard choice when a skull is revealed, and
action history (interactive.rs:60-127, 402-1256, routes 1342-1356).

The reference uses axum+tokio; here Python's stdlib ThreadingHTTPServer
is plenty — every request is a tiny model forward or a host-side game
step.
"""

from __future__ import annotations

import json
import secrets
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from burn_ppo_tpu.checkpoint import CheckpointManager
from burn_ppo_tpu.envs.skull import (
    A,
    BID_BASE,
    CARDS,
    PASS,
    PLACE_ROSE,
    PLACE_SKULL,
    REVEAL_BASE,
    SKULL_C,
    Skull,
)
from burn_ppo_tpu.ops.categorical import apply_action_mask
from burn_ppo_tpu.ppo.normalization import obs_norm_apply
from burn_ppo_tpu.tournament import (
    discover_contestants,
)


class Session:
    def __init__(self):
        self.selected_network = 0
        self.env: Optional[Skull] = None
        self.state = None
        self.history: List[Any] = []  # undo stack of states
        self.pending_discard: Optional[Dict] = None
        self.ai_seat = 0
        self.hide_private_info = False
        self.action_history: List[Dict] = []
        self.last_active = time.time()
        self.key = jax.random.PRNGKey(secrets.randbits(32))
        # Serializes handler threads touching this session's mutable game
        # state (ThreadingHTTPServer: two tabs sharing a sid would race
        # _apply/undo and lose moves; the reference wraps sessions in a
        # mutex). app.lock guards only the sessions dict.
        self.lock = threading.Lock()

    def next_key(self):
        self.key, k = jax.random.split(self.key)
        return k


class InteractiveApp:
    def __init__(self, sources, limit_per_run: int = 1):
        contestants = discover_contestants(sources, limit_per_run=limit_per_run)
        if not contestants:
            raise ValueError("No checkpoints found")
        self.networks = []
        for c in contestants:
            meta = CheckpointManager.load_metadata(c.path)
            if meta["env_name"] != "skull":
                continue
            self.networks.append(
                {
                    "name": c.name,
                    "source": c.source,
                    "meta": meta,
                }
            )
        if not self.networks:
            raise ValueError("Interactive mode requires skull checkpoints")
        self.sessions: Dict[str, Session] = {}
        self.lock = threading.Lock()

    # -- session plumbing -------------------------------------------------
    def session(self, session_id: Optional[str]) -> (str, Session):
        with self.lock:
            sid = session_id or secrets.token_hex(8)
            if sid not in self.sessions:
                self.sessions[sid] = Session()
            s = self.sessions[sid]
            s.last_active = time.time()
            # Drop sessions idle > 2h
            if len(self.sessions) > 64:
                cutoff = time.time() - 7200
                for k in [k for k, v in self.sessions.items() if v.last_active < cutoff]:
                    del self.sessions[k]
            return sid, s

    # -- game helpers ------------------------------------------------------
    def _model_probs(self, sess: Session) -> List[float]:
        net = self.networks[sess.selected_network]
        src = net["source"]
        env = sess.env
        obs = env.obs(sess.state)[None, :]
        if src.obs_norm is not None:
            obs = obs_norm_apply(src.obs_norm, obs)
        logits = src.network.forward_actor(src.params, obs)
        mask = env.action_mask(sess.state).astype(jnp.float32)[None, :]
        masked = apply_action_mask(logits, mask)
        probs = jax.nn.softmax(masked, axis=-1)[0]
        return [float(p) for p in np.asarray(probs)]

    def game_state_json(self, sess: Session) -> Dict:
        if sess.state is None:
            return {"active": False}
        env, s = sess.env, sess.state
        n = env.spec.num_players
        mask = np.asarray(env.action_mask(s))
        cur = int(s.current)
        players = []
        for p in range(n):
            stack_len = int(s.stack_len[p])
            revealed = int(s.revealed[p])
            show = (not sess.hide_private_info) or p == sess.ai_seat
            cards = []
            for i in range(stack_len):
                card = int(s.stack[p * CARDS + i])
                top_rev = i >= stack_len - revealed
                cards.append(
                    ("S" if card == SKULL_C else "R") if (show or top_rev) else "?"
                )
            players.append(
                {
                    "seat": p,
                    "alive": bool((s.has_trap | (s.rose_count > 0))[p]),
                    "wins": int(s.wins[p]),
                    "coasters": int(s.has_trap[p]) + int(s.rose_count[p]),
                    "has_skull": bool(s.has_trap[p]) if show else None,
                    "roses": int(s.rose_count[p]) if show else None,
                    "stack": cards,
                    "revealed": revealed,
                    "passed": bool(s.passed[p]),
                    "is_current": p == cur,
                    "is_ai": p == sess.ai_seat,
                }
            )
        actions = [
            {"id": int(a), "label": env.describe_action(int(a))}
            for a in np.nonzero(mask)[0]
        ]
        return {
            "active": True,
            "phase": ["placing", "bidding", "revealing"][int(s.phase)],
            "current_player": cur,
            "current_bid": int(s.current_bid),
            "current_bidder": int(s.current_bidder),
            "roses_found": int(s.roses_found),
            "game_over": bool(s.game_over),
            "winner": int(s.winner),
            "players": players,
            "valid_actions": actions,
            "pending_discard": sess.pending_discard is not None,
            "ai_seat": sess.ai_seat,
            "hide_private_info": sess.hide_private_info,
            "can_undo": len(sess.history) > 0,
            "render": env.render(s),
        }

    def execute_action(self, sess: Session, action: int) -> Dict:
        env, s = sess.env, sess.state
        mask = np.asarray(env.action_mask(s))
        if action < 0 or action >= A or not mask[action]:
            return {"error": f"invalid action {action}"}
        # Detect a skull reveal -> pause for discard choice
        if int(s.phase) == 2 and action >= REVEAL_BASE:
            target = action - REVEAL_BASE
            idx = int(s.stack_len[target]) - 1 - int(s.revealed[target])
            if idx >= 0 and int(s.stack[target * CARDS + idx]) == SKULL_C:
                sess.pending_discard = {
                    "action": action,
                    "bidder": int(s.current_bidder),
                }
                return {
                    "pending_discard": True,
                    "bidder": int(s.current_bidder),
                    "message": "Skull revealed! Choose which coaster the "
                    "bidder discards.",
                }
        return self._apply(sess, action, discard=-1)

    def _apply(self, sess: Session, action: int, discard: int) -> Dict:
        env = sess.env
        sess.history.append(sess.state)
        if len(sess.history) > 200:
            sess.history = sess.history[-200:]
        state = sess.state.replace(
            forced_discard=jnp.asarray(discard, jnp.int32)
        )
        new_state = env.step(state, jnp.asarray(action, jnp.int32))
        sess.state = new_state.replace(forced_discard=jnp.full((), -1, jnp.int32))
        sess.pending_discard = None
        sess.action_history.append(
            {
                "player": int(state.current),
                "action": env.describe_action(action),
                "ts": time.time(),
            }
        )
        return {"ok": True, "state": self.game_state_json(sess)}

    def execute_discard(self, sess: Session, choice: str) -> Dict:
        if sess.pending_discard is None:
            return {"error": "no pending discard"}
        # Reference lose_coaster_specified (skull.rs:327-360) REJECTS a
        # choice the bidder cannot make; validating here keeps the
        # physical-game assistant from recording a discard that never
        # happened (the jitted env would degrade it to the random path).
        bidder = sess.pending_discard["bidder"]
        s = sess.state
        if choice == "skull" and not bool(s.has_trap[bidder]):
            return {"error": "bidder no longer has their skull coaster"}
        if choice == "rose" and int(s.rose_count[bidder]) <= 0:
            return {"error": "bidder has no rose coasters left"}
        discard = {"random": -1, "skull": 0, "rose": 1}.get(choice, -1)
        action = sess.pending_discard["action"]
        return self._apply(sess, action, discard)


# ---------------------------------------------------------------------------
HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>Skull Assistant</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#1c1f26;color:#e8e8e8}
 header{padding:10px 16px;background:#12141a;display:flex;gap:12px;align-items:center;flex-wrap:wrap}
 h1{font-size:18px;margin:0}
 main{display:grid;grid-template-columns:1fr 320px;gap:14px;padding:14px}
 .card{background:#262a33;border-radius:10px;padding:12px}
 button{background:#3b4252;color:#eee;border:0;border-radius:6px;padding:6px 10px;margin:2px;cursor:pointer}
 button:hover{background:#4c566a}
 button.primary{background:#5e81ac}
 .player{border:1px solid #3b4252;border-radius:8px;padding:8px;margin:6px 0}
 .player.current{border-color:#a3be8c}
 .player.ai{background:#2e3440}
 .chip{display:inline-block;border-radius:4px;padding:1px 7px;margin:1px;background:#434c5e}
 .chip.S{background:#bf616a}.chip.R{background:#a3be8c;color:#111}.chip.q{background:#4c566a}
 .bar{height:10px;background:#5e81ac;border-radius:3px}
 .prob{display:flex;align-items:center;gap:8px;font-size:13px;margin:2px 0}
 .prob span.l{width:120px}
 pre{white-space:pre-wrap;font-size:12px;color:#9aa}
 select{background:#3b4252;color:#eee;border:0;padding:4px}
 #msg{color:#ebcb8b}
</style></head><body>
<header>
 <h1>Skull Assistant</h1>
 <select id="network"></select>
 Players: <select id="nplayers"><option>2</option><option>3</option><option selected>4</option><option>5</option><option>6</option></select>
 AI seat: <select id="aiseat"></select>
 <button class="primary" onclick="newGame()">New game</button>
 <button onclick="undo()">Undo</button>
 <label><input type="checkbox" id="hide" onchange="setHide()"> Hide private info</label>
 <span id="msg"></span>
</header>
<main>
 <div class="card" id="board"></div>
 <div>
  <div class="card"><b>AI suggestion</b>
    <div><button onclick="aiProbs()">Show probabilities</button>
    <button class="primary" onclick="aiSample()">AI plays</button></div>
    <div id="probs"></div></div>
  <div class="card"><b>History</b> <button onclick="clearHist()">clear</button><div id="hist"></div></div>
 </div>
</main>
<script>
let SID = localStorage.getItem('sid') || Math.random().toString(16).slice(2);
localStorage.setItem('sid', SID);
async function api(path, body){
  const r = await fetch(path, {method: body?'POST':'GET',
    headers:{'x-session-id':SID,'content-type':'application/json'},
    body: body?JSON.stringify(body):undefined});
  return r.json();
}
async function init(){
  const nets = await api('/api/networks');
  const sel = document.getElementById('network');
  sel.innerHTML = nets.networks.map((n,i)=>`<option value="${i}">${n}</option>`).join('');
  sel.onchange = ()=>api('/api/select_network',{index:+sel.value});
  refreshSeats(); refresh();
}
function refreshSeats(){
  const n = +document.getElementById('nplayers').value;
  document.getElementById('aiseat').innerHTML =
    Array.from({length:n},(_,i)=>`<option value="${i}">P${i}</option>`).join('');
}
document.getElementById('nplayers').onchange = refreshSeats;
async function newGame(){
  const n = +document.getElementById('nplayers').value;
  const seat = +document.getElementById('aiseat').value;
  await api('/api/new_game', {num_players:n, ai_seat:seat});
  refresh();
}
async function refresh(){
  const s = await api('/api/game_state');
  render(s.state || s);
}
function render(s){
  const b = document.getElementById('board');
  if(!s.active){ b.innerHTML = '<i>No game — press New game.</i>'; return; }
  let h = `<b>Phase:</b> ${s.phase} | <b>Current:</b> P${s.current_player}`;
  if(s.current_bid>0) h += ` | <b>Bid:</b> ${s.current_bid} by P${s.current_bidder} (roses found: ${s.roses_found})`;
  if(s.game_over) h += ` | <b style="color:#a3be8c">WINNER: P${s.winner}</b>`;
  h += s.players.map(p=>`
   <div class="player ${p.is_current?'current':''} ${p.is_ai?'ai':''}">
    <b>P${p.seat}${p.is_ai?' (AI)':''}</b> ${p.alive?'':'&#10060;'}
    wins:${p.wins} coasters:${p.coasters}
    ${p.has_skull===null?'':`| skull:${p.has_skull?'yes':'no'} roses:${p.roses}`}
    ${p.passed?'| <i>passed</i>':''}
    <div>stack: ${p.stack.map(c=>`<span class="chip ${c=='?'?'q':c}">${c}</span>`).join('')}
     ${p.revealed?`(revealed ${p.revealed})`:''}</div>
   </div>`).join('');
  if(s.pending_discard){
    h += `<div><b>Skull revealed!</b> Discard:
      <button onclick="discard('random')">Random</button>
      <button onclick="discard('skull')">Skull</button>
      <button onclick="discard('rose')">Rose</button></div>`;
  } else if(!s.game_over){
    h += '<div>' + s.valid_actions.map(a=>
      `<button onclick="act(${a.id})">${a.label}</button>`).join('') + '</div>';
  }
  b.innerHTML = h;
  loadHist();
}
async function act(a){
  const r = await api('/api/execute_action', {action:a});
  document.getElementById('msg').textContent = r.message || r.error || '';
  refresh();
}
async function discard(c){ await api('/api/execute_discard',{choice:c}); refresh(); }
async function undo(){ await api('/api/undo'); refresh(); }
async function setHide(){
  await api('/api/set_hide_info', {hide: document.getElementById('hide').checked});
  refresh();
}
async function aiProbs(){
  const r = await api('/api/ai_probs', {});
  if(r.error){document.getElementById('msg').textContent=r.error;return;}
  document.getElementById('probs').innerHTML = r.probs.map(p=>
   `<div class="prob"><span class="l">${p.label}</span>
     <div class="bar" style="width:${Math.round(p.prob*160)}px"></div>
     ${(p.prob*100).toFixed(1)}%</div>`).join('');
}
async function aiSample(){
  const r = await api('/api/ai_sample', {});
  document.getElementById('msg').textContent = r.message || r.error || '';
  refresh();
}
async function loadHist(){
  const r = await api('/api/history');
  document.getElementById('hist').innerHTML =
    r.history.slice(-25).reverse().map(e=>`<div>P${e.player}: ${e.action}</div>`).join('');
}
async function clearHist(){ await api('/api/clear_history',{}); loadHist(); }
init();
</script></body></html>
"""


def make_handler(app: InteractiveApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> Dict:
            length = int(self.headers.get("content-length", 0) or 0)
            if length == 0:
                return {}
            try:
                return json.loads(self.rfile.read(length))
            except json.JSONDecodeError:
                return {}

        def do_GET(self):
            sid = self.headers.get("x-session-id")
            if self.path == "/":
                body = HTML.encode()
                self.send_response(200)
                self.send_header("content-type", "text/html; charset=utf-8")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            _, sess = app.session(sid)
            with sess.lock:
                if self.path == "/api/networks":
                    self._json({"networks": [n["name"] for n in app.networks]})
                elif self.path == "/api/game_state":
                    self._json(app.game_state_json(sess))
                elif self.path == "/api/history":
                    self._json({"history": sess.action_history})
                else:
                    self._json({"error": "not found"}, 404)

        def do_POST(self):
            sid = self.headers.get("x-session-id")
            _, sess = app.session(sid)
            try:
                with sess.lock:
                    self._dispatch_post(sess)
            except (TypeError, ValueError) as e:
                # Malformed JSON field types (int(None), int("abc"), ...)
                # answer 400 instead of killing the connection with a
                # traceback.
                self._json({"error": f"bad request: {e}"}, 400)

        def _dispatch_post(self, sess):
            body = self._body()
            path = self.path
            if path == "/api/select_network":
                idx = int(body.get("index", 0))
                if 0 <= idx < len(app.networks):
                    sess.selected_network = idx
                    self._json({"ok": True})
                else:
                    self._json({"error": "bad network index"}, 400)
            elif path == "/api/new_game":
                try:
                    n = int(body.get("num_players", 4))
                    ai_seat = int(body.get("ai_seat", 0))
                except (TypeError, ValueError):
                    self._json({"error": "num_players/ai_seat must be ints"}, 400)
                    return
                if not 2 <= n <= 6:
                    self._json({"error": "num_players must be in [2, 6]"}, 400)
                    return
                if not 0 <= ai_seat < n:
                    self._json({"error": f"ai_seat must be in [0, {n - 1}]"}, 400)
                    return
                sess.env = Skull(n)
                sess.state = sess.env.reset(sess.next_key())
                sess.history = []
                sess.action_history = []
                sess.pending_discard = None
                sess.ai_seat = ai_seat
                self._json({"ok": True, "state": app.game_state_json(sess)})
            elif path == "/api/execute_action":
                if sess.state is None:
                    self._json({"error": "no active game"}, 400)
                else:
                    self._json(app.execute_action(sess, int(body.get("action", -1))))
            elif path == "/api/execute_discard":
                self._json(app.execute_discard(sess, body.get("choice", "random")))
            elif path == "/api/ai_probs":
                if sess.state is None:
                    self._json({"error": "no active game"}, 400)
                else:
                    probs = app._model_probs(sess)
                    mask = np.asarray(sess.env.action_mask(sess.state))
                    items = [
                        {
                            "action": int(a),
                            "label": sess.env.describe_action(int(a)),
                            "prob": probs[a],
                        }
                        for a in np.nonzero(mask)[0]
                    ]
                    items.sort(key=lambda x: -x["prob"])
                    self._json({"probs": items[:12]})
            elif path == "/api/ai_sample":
                if sess.state is None:
                    self._json({"error": "no active game"}, 400)
                else:
                    probs = np.asarray(app._model_probs(sess))
                    mask = np.asarray(sess.env.action_mask(sess.state))
                    probs = probs * mask
                    if probs.sum() <= 0:
                        self._json({"error": "no valid action"}, 400)
                    else:
                        probs = probs / probs.sum()
                        action = int(
                            np.random.default_rng(
                                secrets.randbits(32)
                            ).choice(len(probs), p=probs)
                        )
                        result = app.execute_action(sess, action)
                        result["message"] = (
                            f"AI: {sess.env.describe_action(action)}"
                        )
                        self._json(result)
            elif path == "/api/set_ai_seat":
                seat = int(body.get("seat", 0))
                n_seats = sess.env.n if sess.env is not None else 6
                if not 0 <= seat < n_seats:
                    # Out-of-range seat would hide every hand (show
                    # requires p == ai_seat) and advise a ghost player.
                    self._json(
                        {"error": f"seat must be in [0, {n_seats - 1}]"}, 400
                    )
                else:
                    sess.ai_seat = seat
                    self._json({"ok": True})
            elif path == "/api/set_hide_info":
                sess.hide_private_info = bool(body.get("hide", False))
                self._json({"ok": True})
            elif path == "/api/undo":
                if sess.pending_discard is not None:
                    # A pending reveal never pushed to the undo stack —
                    # undo just cancels the discard prompt. Popping here
                    # would erase the PREVIOUS applied move.
                    sess.pending_discard = None
                    self._json({"ok": True, "message": "discard cancelled"})
                elif sess.history:
                    sess.state = sess.history.pop()
                    if sess.action_history:
                        sess.action_history.pop()
                    self._json({"ok": True})
                else:
                    self._json({"error": "nothing to undo"}, 400)
            elif path == "/api/clear_history":
                sess.action_history = []
                self._json({"ok": True})
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def run_interactive_cli(args) -> int:
    app = InteractiveApp(args.sources, limit_per_run=args.limit_per_run)
    # Loopback by default, like the reference (interactive.rs:1360): the
    # API has no authentication, so a wide bind must be an explicit
    # --host opt-in.
    host = getattr(args, "host", "127.0.0.1")
    server = ThreadingHTTPServer((host, args.port), make_handler(app))
    print(
        f"Skull assistant: http://{'localhost' if host == '127.0.0.1' else host}"
        f":{args.port} ({len(app.networks)} network(s) loaded)"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nshutting down")
    return 0
