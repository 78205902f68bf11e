"""Fused IVF probe-scan kernel (Pallas/TPU).

Replaces the XLA gather path's biggest waste: ``db[lists]`` materializes a
[B, C, cap, d] float buffer in HBM (written once, read back once) just to
feed a matvec. This kernel keeps the inverted lists in HBM, double-buffers
DMAs of each (query, probe-slot)'s list block straight into VMEM, computes
the metric scores there, and writes out only the [cap]-sized score rows —
~2x less HBM traffic per scanned byte and no giant transient buffer.

Grid: one step per (query, probe-chunk). The scalar-prefetched
``lists [B, n_slots]`` tells each step which list blocks to stream; the DMA
of chunk j+1 overlaps with compute on chunk j.

Norms are recomputed in-kernel (a [cap] VPU reduction is free next to the
DMA) instead of DMA'ing the [cap] norm row: Mosaic cannot slice single rows
out of (8,128)-tiled HBM arrays. Padding rows are all-zero, so zero norm ==
padding; consequently the fast path cannot return an exact-zero stored
vector (the XLA path keeps full semantics — zero vectors are pathological
for both metrics: IP data is L2-normalized, L2 zero rows are a degenerate
corpus). Exact top-k selection stays outside (lax.top_k over the score
tensor): selection is algorithmically independent of scanning.

Runs in interpret mode on CPU for CI (``interpret=True``).

STATUS: superseded by ``pallas_kernels/rowscan.py`` (round 2), which
fixes this kernel's mistake — the per-(query,chunk) grid restarts the DMA
pipeline every 8 rows — with a ring whose state persists across grid
steps. The round-2 A/B on the v5e showed BOTH the fixed kernel (~776
GB/s) and XLA's fused gather+einsum (~811 GB/s) at HBM speed-of-light at
worklist shapes, so the production scan stays on XLA; kept for the
pipelining contrast.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from auncel_tpu.types import Metric

CHUNK = 8  # probe slots per grid step


def _kernel(lists_ref, db_ref, q_ref, out_ref, vmem_db, sems,
            *, cap, is_l2):
    qi = pl.program_id(0)      # query index
    ci = pl.program_id(1)      # probe-chunk index

    def copy(slot_in_chunk, buf):
        lid = lists_ref[qi, ci * CHUNK + slot_in_chunk]
        return pltpu.make_async_copy(db_ref.at[lid], vmem_db.at[buf],
                                     sems.at[buf])

    copy(0, 0).start()
    qrow = q_ref[0, 0, :]  # this query's row, pipelined in by BlockSpec
    qsq = jnp.sum(qrow * qrow)

    def body(s, _):
        buf = s % 2

        @pl.when(s + 1 < CHUNK)
        def _():
            copy(s + 1, (s + 1) % 2).start()

        copy(s, buf).wait()
        blk = vmem_db[buf]                 # [cap, d]
        dots = jnp.dot(blk, qrow, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        norms = jnp.sum(blk * blk, axis=-1)
        if is_l2:
            # same >= 0 clamp as every XLA L2 path (bit-parity contract)
            scores = jnp.maximum(qsq + norms - 2.0 * dots, 0.0)
            bad = jnp.inf
        else:
            scores = dots
            bad = -jnp.inf
        scores = jnp.where(norms > 0.0, scores, bad)
        out_ref[0, 0, s, :] = scores
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_slots", "metric", "interpret"))
def scan_scores_pallas(
    db: jax.Array,       # [nlist, cap, d] float32 (pad rows all-zero)
    q: jax.Array,        # [B, d]
    lists: jax.Array,    # [B, n_slots] int32: list id per (query, slot)
    n_slots: int,
    metric: Metric,
    interpret: bool = False,
):
    """Scores for n_slots probe slots per query: [B, n_slots * cap]."""
    B, d = q.shape
    nlist, cap, _ = db.shape
    assert n_slots % CHUNK == 0
    grid = (B, n_slots // CHUNK)

    kernel = functools.partial(_kernel, cap=cap,
                               is_l2=metric is Metric.L2)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),    # db (stays HBM)
                # one query row per grid step — pipelined, no dynamic
                # sublane indexing (which serializes on TPU)
                pl.BlockSpec((1, 1, d), lambda qi, ci, lists: (qi, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, CHUNK, cap),
                lambda qi, ci, lists: (qi, ci, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, cap, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_slots // CHUNK, CHUNK, cap), jnp.float32),
        interpret=interpret,
    )(lists, db, q.reshape(B, 1, d))
    return out.reshape(B, n_slots * cap)
