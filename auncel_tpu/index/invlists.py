"""Composite inverted-list views.

Capability parity with the reference's stacked/sliced/masked
``InvertedLists`` adapters (``InvertedLists.h:211-325``:
ReadOnlyInvertedLists, HStackInvertedLists, VStackInvertedLists,
SliceInvertedLists, MaskedInvertedLists). The reference composes lists
lazily through virtual ``get_codes``/``get_ids`` per probed list —
pointer indirection a TPU scan cannot follow. Here each composition
MATERIALIZES a new dense ``IVFArrays`` once at build time (host-side
numpy; these are build/merge utilities, not hot-path ops), after which
every search path runs at full speed on the combined layout.

Read-only semantics come for free: ``IVFArrays`` is an immutable pytree
(the reference's ReadOnlyInvertedLists exists to *forbid* mutation of a
view; a JAX array cannot be mutated in place at all).

All sources must share the same storage codec (same dtype + the same
sq/pq decode parameters) so the combined arrays stay value-consistent.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from auncel_tpu.index.scan import IVFArrays
from auncel_tpu.ops.distance import sqnorms


def _codec_key(a: IVFArrays):
    def fp(x):
        return None if x is None else np.asarray(x).tobytes()
    return (a.db.dtype, fp(a.sq_scale), fp(a.sq_bias),
            fp(a.pq_codebooks), a.pq_residual is not None)


def _lists_of(a: IVFArrays):
    """Host views: per-list (codes [sz, code_w], ids [sz]) excluding pad."""
    db = np.asarray(a.db)
    ids = np.asarray(a.vec_ids)
    sizes = np.asarray(a.list_sizes)
    return [(db[l, : sizes[l]], ids[l, : sizes[l]]) for l in
            range(db.shape[0])]


def _build(centroids: np.ndarray, lists, proto: IVFArrays) -> IVFArrays:
    """Dense re-pack of per-list (codes, ids) under proto's codec."""
    nlist = len(lists)
    sizes = np.array([len(ids) for _, ids in lists], np.int32)
    cap = max(int(sizes.max()) if nlist else 1, 1)
    code_w = np.asarray(proto.db).shape[-1]
    db = np.zeros((nlist, cap, code_w), np.asarray(proto.db).dtype)
    vec_ids = np.full((nlist, cap), -1, np.int32)
    for l, (codes, ids) in enumerate(lists):
        db[l, : len(ids)] = codes
        vec_ids[l, : len(ids)] = ids
    db_d = jnp.asarray(db)
    cents = jnp.asarray(np.asarray(centroids, np.float32))
    out = IVFArrays(
        centroids=cents, cent_sq=sqnorms(cents), db=db_d,
        db_sq=jnp.zeros((nlist, cap), jnp.float32),
        vec_ids=jnp.asarray(vec_ids),
        list_sizes=jnp.asarray(sizes),
        # interdis is the error-profile engine's input; composed views
        # serve fixed-nprobe search (like the reference's read-only views,
        # which are outside the tune path)
        interdis=jnp.zeros((1, 1), jnp.float32),
        sq_scale=proto.sq_scale, sq_bias=proto.sq_bias,
        pq_codebooks=proto.pq_codebooks, pq_residual=proto.pq_residual)
    # db_sq is the norm of the DECODED STORED value — the residual r for
    # residual-PQ storage (the scan kernels add the centroid terms
    # themselves, scan.py:192-203) — and must stay f32 regardless of the
    # storage dtype (the 1e-5 value-consistency invariant; bf16 norms
    # would be ~3e-2 off).
    dec = out.decode_block(db_d).astype(jnp.float32)
    db_sq = jnp.sum(jnp.square(dec), -1) * (jnp.asarray(vec_ids) >= 0)
    return out._replace(db_sq=db_sq)


def hstack_invlists(arrays: list[IVFArrays]) -> IVFArrays:
    """Concatenate entries list-by-list (reference HStackInvertedLists,
    InvertedLists.h:229: same nlist, list i of the result is the
    concatenation of every source's list i). Sources must share the
    quantizer (same centroids) and codec."""
    assert arrays, "need at least one source"
    a0 = arrays[0]
    c0 = np.asarray(a0.centroids)
    for a in arrays[1:]:
        assert _codec_key(a) == _codec_key(a0), "codec mismatch"
        assert np.array_equal(np.asarray(a.centroids), c0), \
            "HStack requires a shared quantizer"
    per = [_lists_of(a) for a in arrays]
    lists = [(np.concatenate([p[l][0] for p in per], 0),
              np.concatenate([p[l][1] for p in per], 0))
             for l in range(len(per[0]))]
    return _build(c0, lists, a0)


def vstack_invlists(arrays: list[IVFArrays]) -> IVFArrays:
    """Concatenate the list axis (reference VStackInvertedLists,
    InvertedLists.h:278: nlist = sum of source nlists; list numbering is
    offset by the cumulative count). Centroids concatenate the same way."""
    assert arrays, "need at least one source"
    a0 = arrays[0]
    for a in arrays[1:]:
        assert _codec_key(a) == _codec_key(a0), "codec mismatch"
    cents = np.concatenate([np.asarray(a.centroids) for a in arrays], 0)
    lists = []
    for a in arrays:
        lists.extend(_lists_of(a))
    return _build(cents, lists, a0)


def slice_invlists(a: IVFArrays, i0: int, i1: int) -> IVFArrays:
    """Lists [i0, i1) as a standalone nlist = i1-i0 layout (reference
    SliceInvertedLists, InvertedLists.h:256)."""
    assert 0 <= i0 < i1 <= np.asarray(a.db).shape[0]
    return _build(np.asarray(a.centroids)[i0:i1],
                  _lists_of(a)[i0:i1], a)


def masked_invlists(il0: IVFArrays, il1: IVFArrays) -> IVFArrays:
    """il1's NON-EMPTY lists override il0's (reference
    MaskedInvertedLists, InvertedLists.h:307 — used to patch a subset of
    lists, e.g. updated shards, over a large base)."""
    assert _codec_key(il0) == _codec_key(il1), "codec mismatch"
    assert np.asarray(il0.db).shape[0] == np.asarray(il1.db).shape[0]
    l0, l1 = _lists_of(il0), _lists_of(il1)
    lists = [l1[i] if len(l1[i][1]) else l0[i] for i in range(len(l0))]
    return _build(np.asarray(il0.centroids), lists, il0)
