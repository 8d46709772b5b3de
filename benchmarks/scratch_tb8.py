"""Scratch A/B: raise the per-grid-step chain budget so tb=8 (student fwd,
D=192) and tb=4 (teacher fwd, D=384) become reachable, vs the shipped 9 MB
cap (tb<=4). Full-model protocol per ops/fused_block.py: kernel-level A/B is
throttle-noisy; bench.main at fixed batch, variants interleaved round-robin.

Usage: python benchmarks/scratch_tb8.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import deltakd_tpu.ops.fused_block as fb
from bench import main


def set_variant(name):
    if name == "base":
        fb._TB_BUDGET_BYTES = 9 * 2 ** 20
        fb._TB_OPTIONS = (4, 2)
    elif name == "tb8":
        fb._TB_BUDGET_BYTES = 16 * 2 ** 20
        fb._TB_OPTIONS = (8, 4, 2)
    else:
        raise ValueError(name)


# _pick_tb hardcodes (4, 2); patch it to honor an options tuple
fb._TB_OPTIONS = (4, 2)


def _pick_tb(B, N, D, *, bwd):
    elem = 4 * N * ((12 * D + 2 * N) if bwd else (8.5 * D + N))
    for tb in fb._TB_OPTIONS:
        if B % tb == 0 and tb * elem <= fb._TB_BUDGET_BYTES:
            return tb
    return 1


fb._pick_tb = _pick_tb

if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 320
    for rnd in range(2):
        for variant in ("base", "tb8"):
            set_variant(variant)
            try:
                r = main(batch_size=batch, steps=30, e2e=False)
                print(f"TB-AB round={rnd} {variant} b={batch}: {r:.1f} img/s",
                      flush=True)
            except Exception as e:
                print(f"TB-AB round={rnd} {variant} b={batch}: FAIL "
                      f"{type(e).__name__}: {e}", flush=True)
