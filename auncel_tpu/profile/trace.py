"""phi -> U maps ("traces"): one per power-of-two probe stage.

Capability parity with the reference's ``Trace`` (IVF_pro.h:44-62,
IVF_pro.cpp:84-149):

  * ``build_trace`` == ``Trace::SB()``: sort raw (phi, U) pairs by phi
    descending, drop invalid slots, average in batches of ``bs`` (250 by
    default; 1 in validation mode, reference README.md:40-41), per-batch
    std of U (note: the reference divides by ``bs`` even for the ragged
    last batch — replicated), then reverse to ascending phi.
  * ``lookup`` == ``Trace::search(phi, std_m)``: staircase lookup of the
    largest bin with bin_phi <= phi, conservative ``+ std_m * std``
    offset; below range -> first bin; above range -> last bin scaled by
    phi / last_phi (linear extrapolation).

TPU recast: all traces live in one padded ``[n_traces, max_bins]`` tensor
triple so a single compiled lookup serves every stage; the trace index is
static per wave (the wave schedule is unrolled), so selection is free.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_BATCH = 250  # Trace::bs (IVF_pro.h:56)

# U value used for stages with no training data: large enough that the
# termination predicate never fires there (conservative = bound-safe).
EMPTY_TRACE_U = 1e9


class TraceSet(NamedTuple):
    """Device pytree of all per-stage maps."""
    phi: jax.Array     # [n_traces, max_bins] ascending, +inf padded
    u: jax.Array       # [n_traces, max_bins]
    std: jax.Array     # [n_traces, max_bins]
    n_bins: jax.Array  # [n_traces] int32

    @property
    def n_traces(self) -> int:
        return self.phi.shape[0]


def build_trace(phi_pairs: np.ndarray, u_pairs: np.ndarray,
                valid: np.ndarray, bs: int = DEFAULT_BATCH):
    """SB: raw pairs -> (phi_bins, u_bins, std_bins), ascending. Host-side
    numpy — this is offline training, data is tiny (~125k pairs)."""
    phi = np.asarray(phi_pairs, np.float64).ravel()
    u = np.asarray(u_pairs, np.float64).ravel()
    valid = np.asarray(valid, bool).ravel()
    phi, u = phi[valid], u[valid]
    if phi.size == 0:
        return (np.zeros(1, np.float32),
                np.full(1, EMPTY_TRACE_U, np.float32),
                np.zeros(1, np.float32))
    order = np.argsort(-phi, kind="stable")  # descending, like Trace::SB
    phi, u = phi[order], u[order]
    size = phi.size
    sz = (size + bs - 1) // bs
    phi_bins = np.empty(sz, np.float32)
    u_bins = np.empty(sz, np.float32)
    std_bins = np.empty(sz, np.float32)
    for i in range(sz):
        lo, hi = i * bs, min((i + 1) * bs, size)
        phi_bins[i] = phi[lo:hi].mean()
        u_bins[i] = u[lo:hi].mean()
        # reference divides by bs, not the ragged batch length
        # (IVF_pro.cpp:140)
        std_bins[i] = np.sqrt(((u[lo:hi] - u[lo:hi].mean()) ** 2).sum() / bs)
    return phi_bins[::-1].copy(), u_bins[::-1].copy(), std_bins[::-1].copy()


def make_trace_set(per_stage_bins) -> TraceSet:
    """Stack per-stage (phi, u, std) numpy triples into one padded device
    tensor set. ``per_stage_bins``: list of (phi, u, std) ascending arrays."""
    n_traces = len(per_stage_bins)
    max_bins = max(max(p[0].size for p in per_stage_bins), 1)
    phi = np.full((n_traces, max_bins), np.inf, np.float32)
    u = np.zeros((n_traces, max_bins), np.float32)
    std = np.zeros((n_traces, max_bins), np.float32)
    n_bins = np.zeros(n_traces, np.int32)
    for t, (p, uu, s) in enumerate(per_stage_bins):
        nb = p.size
        phi[t, :nb] = p
        u[t, :nb] = uu
        std[t, :nb] = s
        n_bins[t] = nb
    return TraceSet(jnp.asarray(phi), jnp.asarray(u), jnp.asarray(std),
                    jnp.asarray(n_bins))


def trace_lookup(traces: TraceSet, trace_idx: int, phi_q: jax.Array,
                 std_m: jax.Array) -> jax.Array:
    """U(phi) for one (static) stage. phi_q: [B, K] -> [B, K].

    Matches Trace::search (IVF_pro.cpp:84-107): staircase + std_m*std,
    below-range clamps to the first bin, above-range scales the last bin's
    value by phi/last_phi.
    """
    phi_bins = traces.phi[trace_idx]
    u_bins = traces.u[trace_idx]
    std_bins = traces.std[trace_idx]
    nb = traces.n_bins[trace_idx]

    # #(bins <= phi) - 1 as a vectorized compare+sum over the (small,
    # padded-to-max_bins) bin table — NOT jnp.searchsorted, whose default
    # method='scan' lowers to ~log2(bins) SEQUENTIAL tiny kernels on TPU
    # and made each decision block ~ms-scale at batch 1 (this lookup runs
    # once per decision boundary on the hot path).
    idx = jnp.sum(phi_bins[None, None, :] <= phi_q[:, :, None],
                  axis=-1, dtype=jnp.int32) - 1
    idx = jnp.clip(idx, 0, nb - 1)
    base = u_bins[idx] + std_m * std_bins[idx]
    last_phi = phi_bins[nb - 1]
    last_u = u_bins[nb - 1] + std_m * std_bins[nb - 1]
    above = phi_q >= last_phi
    scaled = last_u * (phi_q / jnp.where(last_phi != 0, last_phi, 1.0))
    # degenerate trace (no training pairs -> single phi=0 bin): the
    # "above" scaling would collapse U to ~phi*1e9 ~ 0 and let the
    # predicate fire on an UNTRAINED stage (a silent bound violation);
    # keep the conservative never-terminate sentinel instead (the
    # reference's divide-by-zero yields inf there, same effect)
    scaled = jnp.where(last_phi > 0, scaled, EMPTY_TRACE_U)
    return jnp.where(above, scaled, base)


def save_trace_set(traces: TraceSet, path: str) -> None:
    """Persist a trained profile (improvement over the reference, which
    retrains profiles every run — SURVEY.md §5)."""
    np.savez(path, phi=np.asarray(traces.phi), u=np.asarray(traces.u),
             std=np.asarray(traces.std), n_bins=np.asarray(traces.n_bins))


def load_trace_set(path: str) -> TraceSet:
    with np.load(path) as z:
        return TraceSet(jnp.asarray(z["phi"]), jnp.asarray(z["u"]),
                        jnp.asarray(z["std"]), jnp.asarray(z["n_bins"]))
