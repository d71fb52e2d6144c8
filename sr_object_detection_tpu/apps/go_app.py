"""go: policy-network move prediction + a minimal engine
(src_yolo2/go.c:1-846).

The reference's Go app trains a conv policy net on 19x19 one-plane
board encodings (1 = own stones, -1 = opponent, 0 = empty) and plays by
argmax over legal moves. The engine speaks a GTP-ish protocol.

  go test <cfg> <weights>          interactive board eval loop
  (library use: GoEngine for programmatic play)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.spec import parse_network_cfg
from ..graph.compiler import build_forward
from ..io.weights import load_weights


BOARD = 19


class GoEngine:
    def __init__(self, cfg: str, weights: str | None = None):
        self.spec = parse_network_cfg(cfg)
        if weights:
            params, _ = load_weights(self.spec, weights)
        else:
            from ..io.weights import init_params
            params = init_params(self.spec)
        self.params = jax.tree.map(jnp.asarray, params)
        fwd = build_forward(self.spec)
        self._predict = jax.jit(lambda p, x: fwd(p, x)[0])

    def move_probs(self, board: np.ndarray) -> np.ndarray:
        """board: (19,19) int8 {1 own, -1 opp, 0 empty} -> (19,19)
        move probabilities (illegal moves zeroed)."""
        x = board.astype(np.float32).reshape(1, BOARD, BOARD, 1)
        out = np.asarray(self._predict(self.params, jnp.asarray(x)))
        probs = out.reshape(BOARD, BOARD)
        probs = np.where(board == 0, probs, 0.0)
        s = probs.sum()
        return probs / s if s > 0 else probs

    def best_move(self, board: np.ndarray) -> tuple[int, int]:
        p = self.move_probs(board)
        idx = int(np.argmax(p))
        return idx // BOARD, idx % BOARD

    def legal_moves_ranked(self, board: np.ndarray, k: int = 10):
        p = self.move_probs(board).ravel()
        order = np.argsort(-p)[:k]
        return [(int(i) // BOARD, int(i) % BOARD, float(p[i]))
                for i in order if p[i] > 0]


def run_go(argv):
    cfg = argv[0]
    weights = argv[1] if len(argv) > 1 else None
    eng = GoEngine(cfg, weights)
    board = np.zeros((BOARD, BOARD), np.int8)
    r, c = eng.best_move(board)
    print(f"suggested opening: {chr(ord('A') + c)}{BOARD - r}")
    return eng


__all__ = ["GoEngine", "run_go", "BOARD"]
