"""k-nearest-neighbour query.

Reference semantics: ``knn_point`` (modules/pointnet2_utils.py:211-222) — full
pairwise distance then ``topk(largest=False, sorted=True)`` — and the missing
CUDA ``query_knn_point`` (idx-only variant, SURVEY.md §2.2).

TPU design: selection strategy matters a lot — ``lax.top_k`` lowers to a FULL
SORT of the N axis on TPU (profiled: the sorts were ~45% of the part-seg train
step). Methods:

  'pallas' exact fused distance+top-k kernel, no [B,S,N] HBM materialization
           (TPU default above the size threshold; ops/pallas/knn_pallas.py)
  'sort'   exact, full sort (CPU default; TPU below the threshold)
  'iter'   exact, K scan passes of argmin+mask (~1.8x sort, kept as an option)
  'approx' lax.approx_max_k, recall ~0.98 (opt-in)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mpa_tpu.ops.pairwise import square_distance


def _topk_small_iter(d: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact smallest-k by k passes of argmin + masking. Tie order matches
    lax.top_k (lowest index first). A lax.scan keeps the graph one-body-deep —
    unrolling k rounds across every kNN site blew XLA compile time up >10x."""
    N = d.shape[-1]
    lane = jnp.arange(N, dtype=jnp.int32)

    def body(cur, _):
        i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
        v = jnp.min(cur, axis=-1)
        cur = jnp.where(lane == i[..., None], jnp.inf, cur)
        return cur, (v, i)

    _, (dists, idxs) = jax.lax.scan(body, d, None, length=k)
    # scan stacks on axis 0 -> move k to the last axis.
    return jnp.moveaxis(dists, 0, -1), jnp.moveaxis(idxs, 0, -1)


def knn(
    k: int,
    base: jnp.ndarray,
    query: jnp.ndarray,
    *,
    method: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbours of each query point among the base points.

    Args:
      k: number of neighbours (static).
      base: ``[B, N, C]`` points/features searched over.
      query: ``[B, S, C]`` query points/features.
      method: 'pallas' | 'sort' | 'iter' | 'approx' | None (auto: 'pallas' on
        TPU — exact, fused, no [B,S,N] HBM materialization — 'sort' elsewhere).

    Returns:
      ``(sqr_dists [B, S, k], idx [B, S, k])`` sorted by ascending distance.
    """
    if method is None:
        if jax.default_backend() == "tpu" and query.shape[1] * base.shape[1] >= 30_000:
            # Big distance matrices: the fused kernel avoids the [B,S,N] HBM
            # round-trip. Tiny ones: kernel-launch overhead dominates — the
            # plain sort path is faster. (Threshold re-measured after the
            # min/tie/mask selection rewrite: pallas wins from ~30k pairs up —
            # 0.06 vs 0.15 ms at S=128, N=256.)
            method = "pallas"
        else:
            method = "sort"
    if method == "pallas" and k <= 64:
        from mpa_tpu.ops.pallas.knn_pallas import knn_pallas

        return knn_pallas(k, base, query)
    d = square_distance(query, base)  # [B, S, N] fp32
    if method == "iter" and k <= 16:
        return _topk_small_iter(d, k)
    if method == "approx":
        neg_d, idx = jax.lax.approx_max_k(-d, k)
        return -neg_d, idx
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


def knn_self(
    k: int, points: jnp.ndarray, *, method: Optional[str] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN of a point set against itself (self match at distance 0 included,
    matching the reference's umbrella grouping which keeps then drops slot 0)."""
    return knn(k, points, points, method=method)


def knn_point2(
    k: int, points: jnp.ndarray, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-kNN that randomizes away coincident-duplicate matches.

    Reference semantics (``knn_point2``, modules/pointnet2_utils.py:224-251,
    dead in live paths): zero-distance entries are replaced by ``10 + noise``
    so coincident duplicates stop tying, EXCEPT the true self match on the
    diagonal which is re-zeroed and stays the first neighbour.
    """
    d = square_distance(points, points)  # [B, N, N]
    N = d.shape[-1]
    noise = jax.random.normal(key, d.shape)
    d = jnp.where(d == 0.0, 10.0 + noise, d)
    off_diag = ~jnp.eye(N, dtype=bool)[None]
    d = jnp.where(off_diag, d, 0.0)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx
