"""IVF utility functions.

Capability parity with the reference's ``IVFlib`` (SURVEY.md §2 #22,
``Auncel/IVFlib.{h,cpp}``): centroid-level probes, index merging, subset
extraction, and the sliding-window pattern for streaming corpora. All are
host-level compositions over the packed layout — none touch the device
kernels.
"""

import numpy as np

from auncel_tpu.index.ivf import IVFFlatIndex


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
