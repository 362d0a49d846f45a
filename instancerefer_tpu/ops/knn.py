"""Padded batched k-nearest-neighbors for instance graphs.

TPU-native replacement for torch-cluster ``knn`` behind
``torch_geometric.nn.knn`` (reference ``models/basic_blocks.py:7,120``;
SURVEY.md §2.3 N6).  Instance counts are tiny (≤ MAX_INSTANCES ≈ 128 per
scene), so a dense masked distance matrix + ``top_k`` is both simpler and far
faster on TPU than any tree/hash structure.

Semantics matched to the reference call
``knn(support_xyz, query_xyz, k, batch_index, query_batch_index)``:
* neighbors are drawn only from the query's own scene (cross-batch pairs are
  masked to +inf — torch-cluster partitions by ``batch_index``),
* the query itself is a valid neighbor (the reference's supports include it),
* if a scene has fewer than k valid supports, the reference returns fewer
  edges; here the missing slots duplicate the nearest valid support, which is
  exact under the downstream max-aggregation (duplicated messages do not
  change a max; reference ``DynamicEdgeConv(aggr='max')``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_padded(
    query_xyz: jnp.ndarray,
    support_xyz: jnp.ndarray,
    support_mask: jnp.ndarray,
    k: int,
):
    """Per-scene kNN.

    Args:
      query_xyz:   [B, Q, 3] query positions.
      support_xyz: [B, M, 3] support positions.
      support_mask:[B, M] bool validity of supports.
      k: neighbors per query.

    Returns:
      idx:   [B, Q, k] int32 indices into the support axis.
      valid: [B, Q, k] bool — False only where the scene had zero valid
        supports (then idx is 0).
    """
    # Squared distances; exact distances are unnecessary for ranking.
    d2 = jnp.sum(
        (query_xyz[:, :, None, :] - support_xyz[:, None, :, :]) ** 2, axis=-1
    )  # [B, Q, M]
    big = jnp.finfo(d2.dtype).max
    d2 = jnp.where(support_mask[:, None, :], d2, big)
    neg_top, idx = jax.lax.top_k(-d2, k)  # ascending distance
    found = neg_top > -big
    any_valid = jnp.any(support_mask, axis=-1)[:, None, None]
    # Fill missing slots with the nearest valid support (slot 0).
    fill = idx[..., :1]
    idx = jnp.where(found, idx, fill)
    valid = jnp.broadcast_to(any_valid, idx.shape)
    return idx.astype(jnp.int32), valid
