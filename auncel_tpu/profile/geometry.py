"""Geometric model of IVF search progress (vectorized).

Capability parity with the reference's per-query geometry
(``/root/reference/Auncel/IVF_pro.cpp``):

  * ``cosine_theorem(a, b, c) = c/2 - (a^2 + c^2 - b^2) / (2c)``
    (IVF_pro.cpp:41-51): the query's distance to the Voronoi bisector
    between its home centroid and another centroid, where a = dist(query,
    home), b = dist(query, other), c = dist(home, other).
    **Unit caveat carried over deliberately** (SURVEY.md §3C): the L2 inputs
    are *squared* distances and the formula squares them again; offline and
    online use identical quantities, so the learned phi->U map absorbs the
    transformation. Parity requires consistency, not dimensional correctness.
  * ``sum_angle`` (IVF_pro.cpp:162-177): phi = sum of arccos(dtb_i / kdis)
    over a window of 15 upcoming boundaries; boundaries farther than kdis
    contribute 0 (== arccos of a ratio clipped to 1).
  * IP metric: coarse distances and top-k values are mapped to angles with
    arccos first (the reference uses a 500-entry arccos LUT,
    IVF_pro.cpp:151-184; we use exact arccos — both sides of the map see
    the same transform, which is all consistency requires).

Everything is batched over queries: [B, ...] in, [B, ...] out, no per-query
control flow.
"""

import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric

# Window of upcoming Voronoi boundaries summed into phi (IVF_pro.cpp:263,276:
# hardcoded 15 in every sum_angle call site).
ANGLE_WINDOW = 15
# Boundary-count margin beyond nlist/8 (IVF_pro.cpp:202: "amplify 20 ...").
BOUNDARY_MARGIN = 20


def n_boundaries(nlist: int) -> int:
    """Number of per-query boundary distances (IVF_pro.cpp:202-235:
    max_num = nlist/8 + 20, boundaries computed for k = 0..max_num-2)."""
    return nlist // 8 + BOUNDARY_MARGIN - 1


def safe_arccos(x: jax.Array) -> jax.Array:
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def boundary_distances(
    cdis: jax.Array,      # [B, nlist] coarse distances, best-first
    cids: jax.Array,      # [B, nlist] coarse-ranked centroid ids
    interdis: jax.Array,  # [nlist, nlist] centroid-pair matrix
    metric: Metric,
) -> jax.Array:
    """Distance from each query to the Voronoi bisector between its home
    centroid and each of the next ``n_boundaries`` ranked centroids
    (reference ``error_pro::set_online``, IVF_pro.cpp:196-238).

    Returns dtb [B, n_boundaries]; dtb[:, j] is the boundary between home
    (rank 0) and the rank-(j+1) centroid.
    """
    nlist = interdis.shape[0]
    m = n_boundaries(nlist)
    # With tiny nlist (or a prefix-only coarse ranking) the margin window
    # exceeds the available ranked centroids (the reference would read out
    # of bounds there); use what exists and pad the rest with +inf
    # boundaries, which contribute 0 angle by the skip rule.
    m_eff = min(m, nlist - 1, cdis.shape[1] - 1)
    if metric is Metric.IP:
        cd = safe_arccos(cdis[:, : m_eff + 1])
    else:
        cd = cdis[:, : m_eff + 1]
    home = cids[:, 0]
    others = cids[:, 1 : m_eff + 1]                    # [B, m_eff]
    cen2cen = interdis[home[:, None], others]          # [B, m_eff]
    a = cd[:, :1]                                      # [B, 1] home distance
    b = cd[:, 1 : m_eff + 1]                           # [B, m_eff]
    c = jnp.maximum(cen2cen, 1e-20)                    # guard degenerate pairs
    dtb = c / 2.0 - (a * a + c * c - b * b) / (2.0 * c)
    if m_eff < m:
        dtb = jnp.pad(dtb, ((0, 0), (0, m - m_eff)),
                      constant_values=jnp.inf)
    return dtb


def sum_angle(
    kdis: jax.Array,   # [B, K] candidate distances (angle-space for IP)
    dtb: jax.Array,    # [B, n_boundaries]
    start: int,        # static: first boundary index (reference: stage-1 /
                       # nprobe-1, IndexIVF.cpp:668 / IVF_pro.cpp:276)
) -> jax.Array:
    """phi over the 15-boundary window for every candidate: [B, K].

    Reference rule (IVF_pro.cpp:166-175): a boundary with dtb >= kdis is
    skipped (contributes 0); otherwise it contributes arccos(dtb/kdis).
    The skip test is replicated explicitly so the kdis <= 0 corner behaves
    like the reference (everything skipped -> phi = 0) instead of hitting
    a division domain error.
    """
    window = jax.lax.slice_in_dim(dtb, start, start + ANGLE_WINDOW, axis=1)
    w = window[:, None, :]                             # [B, 1, 15]
    k3 = kdis[:, :, None]                              # [B, K, 1]
    denom = jnp.where(jnp.abs(k3) > 1e-30, k3, 1e-30)
    contrib = jnp.where(w >= k3, 0.0, safe_arccos(w / denom))
    return jnp.sum(contrib, axis=-1)
