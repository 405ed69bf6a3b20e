"""Independent plain-Python rules engines for the bluffing games.

These are deliberately naive (dicts, lists, loops — no JAX, no numpy in
the rules logic) re-implementations written directly from the
reference's semantics, used as differential oracles: fuzz tests replay
random games through both an oracle and the JAX env and diff masks,
phases, turn order, rewards, observations and placements step-for-step.
A divergence is a bug in one of the two.
"""
