"""A/B the blocked_scan block size on one bench path on real TPU.

Usage: python scripts/ab_scan_block.py [cartpole|selfplay|skull] [blocks...]

Runs the named bench path once per block size (BURN_PPO_SCAN_BLOCK is
read at trace time, so each run re-traces) and prints sps per block.
Drives VERDICT r4 task 3: recover the cartpole headline without losing
the skull/selfplay blocked-scan wins.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "cartpole"
    blocks = [int(b) for b in sys.argv[2:]] or [1, 8]

    import jax
    import jax.numpy as jnp

    import bench

    fn = {
        "cartpole": lambda: bench.bench_cartpole(jax, jnp)[::2],  # (sps, spread)
        "selfplay": lambda: bench.bench_selfplay_pool(jax, jnp)[:1],
        "skull": lambda: bench.bench_skull_ctde(jax, jnp)[:1],
    }[path]

    results = {}
    for b in blocks:
        os.environ["BURN_PPO_SCAN_BLOCK"] = str(b)
        out = fn()
        sps = out[0]
        spread = out[1] if len(out) > 1 else float("nan")
        results[b] = sps
        print(
            f"[ab] {path} block={b}: {sps/1e6:.2f}M sps"
            + (f" (spread {spread:.1f}%)" if spread == spread else ""),
            flush=True,
        )
    best = max(results, key=results.get)
    print(
        f"[ab] best: block={best} ({results[best]/1e6:.2f}M sps; "
        + ", ".join(
            f"{b}:{v/results[best]*100:.1f}%" for b, v in sorted(results.items())
        )
        + ")"
    )


if __name__ == "__main__":
    main()
