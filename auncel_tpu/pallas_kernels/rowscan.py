"""Worklist row-scan kernel (Pallas/TPU) — the multirow hot loop.

The XLA scan path (index/scan.py) gathers ``db[rows]`` into a
[B, W, row_cap, d] HBM transient: every scanned byte is written to HBM
and read back before the MXU sees it, and masked slots are gathered
anyway. This kernel replaces the gather+contract with a FLAT WORKLIST:

  * the caller compacts the active (query, row) pairs of a wave into
    ``work_rows``/``work_q`` (padded to a bucket);
  * the kernel streams each row block HBM->VMEM through an NBUF-deep DMA
    ring whose state lives in scratch and therefore SURVIVES grid steps —
    the pipeline never drains at step boundaries (the round-1 kernel's
    mistake: per-(query,chunk) grid steps restarted the pipeline and
    payed full DMA latency every 8 rows);
  * the matching query rows arrive as a normal BlockSpec-pipelined input
    (no dynamic VMEM sublane reads);
  * the kernel outputs DOTS only ([T, row_cap]); the caller assembles
    scores as q_sq + db_sq - 2*dots with db_sq GATHERED from the packed
    layout (4 bytes/slot, 1/128 of the db traffic), so every score term
    except the dot is bitwise-identical to the XLA path, and the MXU dot
    itself matches within ~1e-7 rel (same unit, same f32-HIGHEST
    contraction) — inside the kscaling 1e-5 value-match tolerance.

Runs in interpret mode on CPU for CI.

MEASURED VERDICT (one v5e via axon, bench shapes, 2026-08-16): at
T=65536 worklist entries (8.6 GB of rows) this kernel sustains
~776 GB/s effective — and XLA's fused gather+einsum over the SAME
worklist sustains ~811 GB/s, i.e. HBM speed-of-light. The round-1
assumption that the XLA gather pays a 2x HBM transient does not hold at
worklist shapes: XLA fuses the gather into the contraction. Both paths
are bandwidth-saturated, so the production scan stays on XLA (simpler,
equally fast); this kernel is kept as the proof and as the substrate for
fusing work XLA cannot (e.g. in-scan thresholding), and the wall-clock
battle moved to the exact top-k merges (see ops/topk.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 8      # DMA ring depth
TCHUNK = 16   # worklist entries per grid step (unrolled in-kernel)


def _kernel(work_ref, db_ref, qs_ref, out_ref, bufs, sems, *, T_pad):
    i = pl.program_id(0)

    def dma(t):
        return pltpu.make_async_copy(
            db_ref.at[work_ref[t]], bufs.at[t % NBUF], sems.at[t % NBUF])

    # prologue: fill the ring before the first compute of the program
    @pl.when(i == 0)
    def _():
        for s in range(min(NBUF, TCHUNK)):
            dma(s).start()

    for j in range(TCHUNK):          # static unroll: qs_ref[j] is aligned
        t = i * TCHUNK + j
        dma(t).wait()
        blk = bufs[t % NBUF]         # [row_cap, d]
        out_ref[j, :] = jnp.dot(blk, qs_ref[j, :],
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        # refill the slot just consumed (t+NBUF lands in t % NBUF): the
        # start must come AFTER the dot that reads the slot
        @pl.when(t + NBUF < T_pad)
        def _():
            dma(t + NBUF).start()


@functools.partial(jax.jit, static_argnames=("interpret",))
def rowscan_dots(
    db: jax.Array,         # [n_rows, row_cap, d] float32
    work_rows: jax.Array,  # [T_pad] int32 row ids (pad: any valid id)
    qs: jax.Array,         # [T_pad, d] float32 (query row per entry)
    interpret: bool = False,
):
    """dots[t, c] = <db[work_rows[t], c, :], qs[t, :]> for every worklist
    entry; T_pad must be a multiple of TCHUNK."""
    T_pad, d = qs.shape
    _, row_cap, _ = db.shape
    assert T_pad % TCHUNK == 0
    kernel = functools.partial(_kernel, T_pad=T_pad)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T_pad // TCHUNK,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # db stays in HBM
                pl.BlockSpec((TCHUNK, d), lambda i, work: (i, 0)),
            ],
            out_specs=pl.BlockSpec((TCHUNK, row_cap),
                                   lambda i, work: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((NBUF, row_cap, d), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, row_cap), jnp.float32),
        interpret=interpret,
    )(work_rows, db, qs)
