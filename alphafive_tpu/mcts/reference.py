"""Scalar recursive MCTS — the correctness oracle for the array search.

Mirrors the reference family's recursive select→expand→evaluate→backup
structure (SURVEY.md §3.2) with the *exact* conventions of
mcts/search.py, so tests can assert bit-equal visit counts on frozen
evaluators (SURVEY.md §4 "Unit (MCTS)"). NumPy float32 throughout — the
formulas are written with the same op order as the XLA implementation so
f32 results match bitwise on CPU.

Shared conventions (the single source of truth, also in search.py):
  * Edge statistics N(s,a), W(s,a), P(s,a); Q = W/N (0 if N=0), W is from
    the perspective of the player to move at s.
  * Node visit count Ns = 1 + Σ_a N(s,a) (the node's own evaluation).
  * PUCT score = Q + c_puct · P · √Ns / (1 + N(s,a)); illegal = -inf;
    ties broken by lowest action index.
  * Leaf value = (winner · to_play) for terminal leaves (handles the
    renju_lite forbidden-move case where the mover loses), else the
    evaluator's value, always from the leaf's to-play perspective; backup
    flips the sign each ply.
  * Root priors: masked softmax of evaluator logits, optionally mixed with
    Dirichlet noise: (1-ε)·p + ε·d over legal moves.
  * A fresh tree per move (no subtree reuse). The reference reuses subtrees
    via `update_with_move` (SURVEY.md §2 "MCTS player"); with fixed-size
    arrays re-rooting costs a compaction pass, and a fresh tree with the
    same simulation budget is the standard array-MCTS design (mctx).
    MEASURED, not just asserted: ReuseMCTS below implements the
    reference's reuse, and the equal-budget A/B
    (benchmarks/ab_subtree_reuse.py) scored reuse 0.531 ± 0.088 over 32
    games — no detectable advantage (docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from alphafive_tpu.env.scalar import ScalarGomoku

# evaluator: (board_flat int8[A], to_play int, last int) -> (logits f32[A], v f32)
Evaluator = Callable[[np.ndarray, int, int], Tuple[np.ndarray, float]]


def masked_softmax_np(logits: np.ndarray, legal: np.ndarray) -> np.ndarray:
    if not legal.any():  # terminal node: priors are unused, avoid 0/0
        return np.zeros_like(logits, dtype=np.float32)
    x = np.where(legal, logits.astype(np.float32), np.float32(-np.inf))
    m = np.max(x)
    ex = np.where(legal, np.exp(x - m, dtype=np.float32), np.float32(0))
    return ex / np.sum(ex, dtype=np.float32)


class _Node:
    __slots__ = ("game", "prior", "n", "w", "child")

    def __init__(self, game: ScalarGomoku, prior: np.ndarray):
        self.game = game
        self.prior = prior.astype(np.float32)  # [A]
        a = game.num_actions
        self.n = np.zeros(a, np.float32)
        self.w = np.zeros(a, np.float32)
        self.child = {}  # action -> _Node


def make_root(game: ScalarGomoku, evaluate: Evaluator,
              root_noise: Optional[np.ndarray] = None,
              dirichlet_eps: float = 0.25) -> "_Node":
    logits, _ = evaluate(game.board.reshape(-1), game.to_play, game.last_move)
    p = masked_softmax_np(np.asarray(logits), game.legal_mask())
    if root_noise is not None:
        eps = np.float32(dirichlet_eps)
        p = (np.float32(1) - eps) * p + eps * root_noise.astype(np.float32)
    return _Node(game.copy(), p)


def _playout(root: "_Node", evaluate: Evaluator, c_puct: np.float32,
             root_action: Optional[int] = None):
    """One PUCT playout in place. `root_action` pins the first descent step
    (the Gumbel search's forced root edge — run_gumbel_reference below).
    Returns (path [(node, action)], leaf value v BEFORE the first sign
    flip) so duplicate Gumbel lanes can replay the same deltas."""
    node = root
    path = []  # [(node, action)]
    # --- select ---
    while True:
        if node.game.done:
            break
        legal = node.game.legal_mask()
        q = np.where(node.n > 0, node.w / np.maximum(node.n, 1),
                     np.float32(0))
        ns = np.float32(1) + np.sum(node.n, dtype=np.float32)
        u = c_puct * node.prior * np.sqrt(ns) / (np.float32(1) + node.n)
        score = np.where(legal, q + u, np.float32(-np.inf))
        a = int(np.argmax(score))
        if root_action is not None and node is root:
            a = int(root_action)
        path.append((node, a))
        if a not in node.child:
            # --- expand ---
            g = node.game.copy()
            g.step(a)
            cl, _cv = evaluate(g.board.reshape(-1), g.to_play, g.last_move)
            cp = masked_softmax_np(np.asarray(cl), g.legal_mask())
            node.child[a] = _Node(g, cp)
            node = node.child[a]
            break
        node = node.child[a]

    # --- evaluate leaf ---
    g = node.game
    if g.done:
        v = np.float32(g.winner * g.to_play)
    else:
        _, v = evaluate(g.board.reshape(-1), g.to_play, g.last_move)
        v = np.float32(v)

    _apply_backup(path, v)
    return path, v


def _apply_backup(path, v: np.float32) -> None:
    """Backup (sign flip per ply): after the flip, v is from the parent's
    perspective — which is the child-perspective for the next level up, so
    one flip per ply."""
    for parent, a in reversed(path):
        v = -v
        parent.n[a] += np.float32(1)
        parent.w[a] += v


def simulate(root: "_Node", evaluate: Evaluator, num_simulations: int,
             c_puct: float) -> None:
    """Run `num_simulations` PUCT playouts in place on `root`."""
    c_puct = np.float32(c_puct)
    for _ in range(num_simulations):
        _playout(root, evaluate, c_puct)


def run_mcts_reference(
    game: ScalarGomoku,
    evaluate: Evaluator,
    num_simulations: int,
    c_puct: float,
    root_noise: Optional[np.ndarray] = None,
    dirichlet_eps: float = 0.25,
) -> Tuple[np.ndarray, float]:
    """Fresh-tree search. Returns (N(root,·) f32[A], root value estimate)."""
    assert not game.done, "cannot search a terminal position"
    root = make_root(game, evaluate, root_noise, dirichlet_eps)
    simulate(root, evaluate, num_simulations, c_puct)
    n_sum = np.sum(root.n, dtype=np.float32)
    root_value = (np.sum(root.w, dtype=np.float32) / n_sum) if n_sum > 0 else 0.0
    return root.n.copy(), float(root_value)


def run_gumbel_reference(
    game: ScalarGomoku,
    evaluate: Evaluator,
    num_simulations: int,
    c_puct: float,
    gumbel: np.ndarray,
    m: int = 16,
    c_visit: float = 50.0,
    c_scale: float = 1.0,
) -> Tuple[np.ndarray, int, np.ndarray]:
    """Scalar oracle for mcts/gumbel.py (same schedule, scores, tie-breaks).

    Returns (root visit counts f32[A], chosen action, π' f32[A]).

    Parallel-lane semantics reproduced exactly: lanes of one pass descend
    disjoint subtrees (distinct forced root children; depth 0 ignores root
    stats), so sequential playouts match the batched search bit-for-bit —
    EXCEPT duplicate lanes (candidate padding when legal moves < m), which
    in the array search replay the same pre-pass descent; here the
    duplicate's deltas are re-applied along the first lane's path instead
    of re-descending (a second sequential descent would see the first
    lane's backup and could diverge).
    """
    from alphafive_tpu.mcts.gumbel import build_schedule

    assert not game.done
    c_puct = np.float32(c_puct)
    a_n = game.num_actions
    logits, root_v = evaluate(game.board.reshape(-1), game.to_play,
                              game.last_move)
    logits = np.asarray(logits, np.float32)
    legal = game.legal_mask()
    root = make_root(game, evaluate)  # no noise: priors = softmax(logits)

    glogits = np.where(legal, gumbel.astype(np.float32) + logits,
                       np.float32(-np.inf))
    schedule = build_schedule(num_simulations, min(m, a_n))
    m_eff = schedule[0][0]
    # top-m by g + logits, ties to the lowest index (lax.top_k semantics)
    order = np.lexsort((np.arange(a_n), -glogits))
    cand = order[:m_eff].copy()
    cand[~legal[cand]] = cand[0]  # pad: duplicate the best candidate

    def sigma(q: np.ndarray) -> np.ndarray:
        return ((np.float32(c_visit) + np.max(root.n))
                * np.float32(c_scale) * q)

    def cand_scores(cur):
        q = np.where(root.n > 0, root.w / np.maximum(root.n, 1),
                     np.float32(0))
        score_all = glogits + sigma(q)
        return score_all[cur]

    for lanes, passes in schedule:
        if len(cand) != lanes:  # halve: top-`lanes` survivors, in
            # descending-score order with ties to the lowest list index
            # (exactly lax.top_k's output order in the array search)
            sc = cand_scores(cand)
            keep = np.lexsort((np.arange(len(cand)), -sc))[:lanes]
            cand = cand[keep]
        for _ in range(passes):
            seen = {}  # root action -> (path, v) of the pass's first lane
            for j in range(lanes):
                ra = int(cand[j])
                if ra in seen:
                    path, v = seen[ra]
                    _apply_backup(path, v)
                else:
                    seen[ra] = _playout(root, evaluate, c_puct,
                                        root_action=ra)

    sc = cand_scores(cand)
    action = int(cand[int(np.argmax(sc))])

    # improved policy π' = softmax(logits + σ(completed Q))
    n0 = root.n
    q = np.where(n0 > 0, root.w / np.maximum(n0, 1), np.float32(0))
    n_sum = np.sum(n0, dtype=np.float32)
    visited = n0 > 0
    pi_net = root.prior
    pi_vis = np.where(visited, pi_net, np.float32(0))
    sum_pi_vis = np.sum(pi_vis, dtype=np.float32)
    if sum_pi_vis > 0:
        wq = np.sum(pi_vis * q, dtype=np.float32) / sum_pi_vis
        v_mix = (np.float32(root_v) + n_sum * wq) / (np.float32(1) + n_sum)
    else:
        v_mix = np.float32(root_v)
    completed = np.where(visited, q, v_mix)
    pi_target = masked_softmax_np(logits + sigma(completed), legal)
    return root.n.copy(), action, pi_target


class ReuseMCTS:
    """Scalar MCTS player WITH subtree reuse (`update_with_move`) — the
    reference family's behavior (SURVEY.md §2 "MCTS player", §3.1): after
    every move (own or opponent's) the played child becomes the new root,
    keeping its accumulated statistics; each get-action call then runs the
    same per-move simulation budget on top. Exists to settle the
    fresh-vs-reuse question with data (benchmarks/ab_subtree_reuse.py,
    round-1 VERDICT item 5) — the array search deliberately uses fresh
    trees (docs/PERFORMANCE.md records the measured strength delta)."""

    def __init__(self, evaluate: Evaluator, c_puct: float = 5.0):
        self.evaluate = evaluate
        self.c_puct = c_puct
        self.root: Optional[_Node] = None

    def search(self, game: ScalarGomoku, num_simulations: int) -> np.ndarray:
        assert not game.done
        if self.root is None:
            self.root = make_root(game, self.evaluate)
        assert np.array_equal(self.root.game.board, game.board), (
            "tree out of sync: call update_with_move after every move")
        simulate(self.root, self.evaluate, num_simulations, self.c_puct)
        return self.root.n.copy()

    def update_with_move(self, action: int) -> None:
        """Re-root on `action` (played by either side)."""
        if self.root is None:
            return
        child = self.root.child.get(action)
        self.root = child  # None -> fresh root built lazily in search()
