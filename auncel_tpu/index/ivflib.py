"""IVF utility functions.

Capability parity with the reference's ``IVFlib`` (SURVEY.md §2 #22,
``Auncel/IVFlib.{h,cpp}``): centroid-level probes, index merging, subset
extraction, and the sliding-window pattern for streaming corpora. All are
host-level compositions over the packed layout — none touch the device
kernels.
"""

import numpy as np

from auncel_tpu.index.ivf import IVFFlatIndex


def extract_index_ivf(index) -> IVFFlatIndex:
    """Unwrap meta/transform wrappers down to the embedded IVF index
    (reference IVFlib::extract_index_ivf, IVFlib.h:35-36 — walks
    IndexPreTransform; ours also walks IndexIDMap, which shares the
    ``sub`` convention). Raises TypeError when there is no IVF inside."""
    seen = index
    while not isinstance(index, IVFFlatIndex):
        sub = getattr(index, "sub", None)
        if sub is None:
            raise TypeError(
                f"no IVF index inside {type(seen).__name__} "
                f"(stopped at {type(index).__name__})")
        index = sub
    return index


def check_compatible_for_merge(index0, index1) -> None:
    """Raise ValueError unless the two indexes share dimensionality,
    metric, quantizer (same centroids), and storage codec (reference
    IVFlib::check_compatible_for_merge, IVFlib.h:27-28: same parameters,
    trained the same way)."""
    a = extract_index_ivf(index0)
    b = extract_index_ivf(index1)
    if a.d != b.d:
        raise ValueError(f"dimension mismatch: {a.d} vs {b.d}")
    if a.metric is not b.metric:
        raise ValueError(f"metric mismatch: {a.metric} vs {b.metric}")
    if a.nlist != b.nlist:
        raise ValueError(f"nlist mismatch: {a.nlist} vs {b.nlist}")
    if a.storage != b.storage:
        raise ValueError(f"storage codec mismatch: "
                         f"{a.storage} vs {b.storage}")
    if not (a.is_trained and b.is_trained):
        raise ValueError("both indexes must be trained")
    if not np.array_equal(a.centroids, b.centroids):
        raise ValueError("indexes are trained with different quantizers "
                         "(centroids differ)")


def search_with_parameters(index, q: np.ndarray, k: int, nprobe: int,
                           max_codes: int = 0):
    """One search under explicit (nprobe, max_codes) without mutating the
    index's persistent settings (reference IVFlib::search_with_parameters,
    IVFlib.h:121-126: an IVFSearchParameters override that works through
    an IndexPreTransform wrapper)."""
    ivf = extract_index_ivf(index)
    saved = (ivf.nprobe, ivf.max_codes)
    ivf.nprobe, ivf.max_codes = int(nprobe), int(max_codes)
    try:
        return index.search(q, k)
    finally:
        ivf.nprobe, ivf.max_codes = saved


def get_invlist_range(index, i0: int, i1: int):
    """Lists [i0, i1) as a standalone inverted-list container (reference
    IVFlib::get_invlist_range, IVFlib.h:111-113 — returns an
    ArrayInvertedLists; here a sliced dense ``IVFArrays`` carrying the
    source codec, the same container the composite invlist views use)."""
    from auncel_tpu.index.invlists import slice_invlists
    ivf = extract_index_ivf(index)
    return slice_invlists(ivf.arrays, i0, i1)


def set_invlist_range(index, i0: int, i1: int, src) -> None:
    """Replace lists [i0, i1) with ``src`` (a ``get_invlist_range`` slice;
    reference IVFlib::set_invlist_range, IVFlib.h:115-117).

    The slice must come from an index trained with the SAME quantizer
    (verified against the centroid rows) — the reference splices raw list
    memory under that same implicit contract. Our packed layout rebuilds
    by assignment, so content is re-homed through the shared quantizer:
    value-identical for quantizer-consistent slices. Requires the default
    no-spill packing (cap_quantile == 1.0); spilled layouts re-home
    boundary vectors differently and the splice would not round-trip."""
    from auncel_tpu.index.ivf import (decoded_db, preserve_sq_range,
                                      IVFFlatDedupIndex)
    ivf = extract_index_ivf(index)
    if ivf.cap_quantile < 1.0:
        raise ValueError("set_invlist_range requires cap_quantile == 1.0 "
                         "(list spilling re-homes boundary vectors)")
    if isinstance(ivf, IVFFlatDedupIndex):
        # the rebuild path would drop the dedup multimap for EVERY list,
        # not just the replaced range (the reference splices raw invlist
        # memory and leaves its dedup map intact)
        raise TypeError("set_invlist_range does not support "
                        "IVFFlatDedupIndex")
    if ivf.storage.startswith("pq"):
        # re-adding decoded vectors RETRAINS the PQ codebooks, shifting
        # codes (and distances) for lists the splice never touched —
        # unlike SQ, there is no exact-code re-encode to pin
        # (preserve_sq_range's trick has no PQ equivalent)
        raise ValueError("set_invlist_range does not support pq storage "
                         "(codebooks would retrain; distances of "
                         "untouched lists would shift)")
    a = ivf.arrays
    n_src = np.asarray(src.db).shape[0]
    if not (0 <= i0 < i1 <= a.nlist and n_src == i1 - i0):
        raise ValueError(f"range [{i0}, {i1}) does not match src nlist "
                         f"{n_src}")
    if not np.allclose(np.asarray(src.centroids),
                       np.asarray(a.centroids)[i0:i1]):
        raise ValueError("src slice was built under a different quantizer "
                         "(centroid rows differ)")
    dst_dec, dst_ids = decoded_db(a), np.asarray(a.vec_ids)
    src_dec, src_ids = decoded_db(src), np.asarray(src.vec_ids)
    keep = dst_ids >= 0
    keep[i0:i1] = False                      # dropped: replaced range
    take = src_ids >= 0                      # inserted: src contents
    x = np.concatenate([dst_dec[keep], src_dec[take]], 0)
    ids = np.concatenate([dst_ids[keep], src_ids[take]], 0).astype(np.int64)
    preserve_sq_range(ivf)                   # keep SQ codes bit-stable
    ivf.reset()
    if x.shape[0]:
        ivf.add(x, ids=ids)


def search_centroid(index: IVFFlatIndex, x: np.ndarray) -> np.ndarray:
    """Nearest-centroid id per row (reference IVFlib::search_centroid)."""
    return index.assign(x)


def search_and_return_centroids(index: IVFFlatIndex, q: np.ndarray, k: int,
                                nprobe: int):
    """Search and also report which list each result came from
    (reference IVFlib::search_and_return_centroids). Returns
    (vals, ids, result_centroids [nq, k])."""
    vals, ids = index.search(q, k, nprobe=nprobe)
    a = index.arrays
    ids_np = np.asarray(a.vec_ids)
    max_id = int(ids_np.max()) if ids_np.size else 0
    vec2list = np.full(max_id + 2, -1, np.int32)
    for l in range(a.nlist):
        m = ids_np[l][ids_np[l] >= 0]
        vec2list[m] = l
    cent = np.where(ids >= 0, vec2list[np.maximum(ids, 0)], -1)
    return vals, ids, cent


def extract_vectors(index: IVFFlatIndex):
    """All stored (decoded) vectors + their ids from the packed layout
    (decoded_db applies the per-list centroid for residual-PQ storage —
    returning raw residuals here made merge_into/copy_subset_to re-add
    garbage for pq indexes)."""
    from auncel_tpu.index.ivf import decoded_db
    a = index.arrays
    db = decoded_db(a)
    ids = np.asarray(a.vec_ids)
    keep = ids >= 0
    return db[keep].astype(np.float32), ids[keep].astype(np.int64)


def merge_into(dst: IVFFlatIndex, src: IVFFlatIndex) -> None:
    """Move src's vectors into dst (reference IVFlib::merge_into; there an
    inverted-list splice, here a re-add + repack under dst's quantizer)."""
    assert dst.d == src.d and dst.metric is src.metric
    x, ids = extract_vectors(src)
    if x.shape[0]:
        dst.add(x, ids=ids)
    src.reset()


def copy_subset_to(src: IVFFlatIndex, dst: IVFFlatIndex,
                   id_min: int, id_max: int) -> int:
    """Copy vectors with ids in [id_min, id_max) (reference
    IndexIVF::copy_subset_to subset_type=0). Returns the count copied."""
    x, ids = extract_vectors(src)
    sel = (ids >= id_min) & (ids < id_max)
    if sel.any():
        dst.add(x[sel], ids=ids[sel])
    return int(sel.sum())


class SlidingIndexWindow:
    """Streaming corpus window (reference IVFlib::SlidingIndexWindow): keep
    the most recent ``nw`` batches searchable; appending a new batch beyond
    the window drops the oldest. Rebuilds the packed layout per step — the
    packing is a device scatter, so the cost is one upload of the window."""

    def __init__(self, index: IVFFlatIndex, nw: int):
        self.index = index
        self.nw = nw
        self._batches: list[tuple[np.ndarray, np.ndarray]] = []

    def step(self, x: np.ndarray, ids: np.ndarray) -> None:
        self._batches.append((np.asarray(x, np.float32),
                              np.asarray(ids, np.int64)))
        if len(self._batches) > self.nw:
            self._batches.pop(0)
        self.index.reset()
        for bx, bids in self._batches:
            self.index.add(bx, ids=bids)
