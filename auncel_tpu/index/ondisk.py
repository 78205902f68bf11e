"""Search directly from disk without materializing the corpus.

Capability parity with the reference's ``OnDiskInvertedLists``
(``/root/reference/Auncel/OnDiskInvertedLists.h:51``: mmap'd inverted
lists + ``prefetch_lists`` pread threads): the packed list tensor stays a
memory-mapped ``.npy``; a search pages from disk ONLY the lists the query
batch actually probes, uploads one compact block batch to the device, and
scans there. Host RAM holds the centroids and the touched pages — a corpus
larger than RAM (or HBM) is served at the cost of one host->device upload
per search.

TPU recast notes: the reference's prefetch threads hide HDD latency before
a CPU scan; here the analogous overlap is the OS page cache + the single
batched upload (one transfer through the tunnel instead of per-list
reads). The probed-list union is deduplicated across the batch, so a
popular list is read and uploaded once per search, not once per query.
"""

import functools
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.scan import IVFArrays, scan_probe_range
from auncel_tpu.ops.distance import sqnorms, pairwise_scores
from auncel_tpu.ops.topk import topk_scores, init_topk


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "metric"))
def _scan_uploaded(blocks, block_ids, cents, cent_sq, q, probe, nprobe,
                   k, metric):
    """Device half of an on-disk search: coarse-free scan of the uploaded
    compact block batch. ``probe`` [B, nprobe] indexes into ``blocks``."""
    B = q.shape[0]
    q_sq = sqnorms(q)
    db_sq = jnp.sum(jnp.square(blocks), axis=-1) * (block_ids >= 0)
    arrays = IVFArrays(
        centroids=cents, cent_sq=cent_sq, db=blocks, db_sq=db_sq,
        vec_ids=block_ids,
        list_sizes=jnp.zeros((blocks.shape[0],), jnp.int32),
        interdis=jnp.zeros((1, 1), jnp.float32))
    vals, ids = init_topk((B,), k, metric)
    limit = jnp.full((B,), nprobe, jnp.int32)
    return scan_probe_range(arrays, q, q_sq, probe, vals, ids, limit, 0,
                            nprobe, metric)


class OnDiskIVFIndex:
    """Read-only IVF-Flat index served from an on-disk directory written
    by ``save_index_ondisk`` — fixed-nprobe search path (the reference's
    OnDiskInvertedLists serves the same stock search path; the
    error-bounded engine needs the index resident in HBM)."""

    def __init__(self, dirpath: str):
        with open(os.path.join(dirpath, "header.json")) as f:
            self.header = json.load(f)
        assert self.header["kind"] == "IVFFlatOnDisk"
        self.d = self.header["d"]
        self.nlist = self.header["nlist"]
        self.ntotal = self.header["ntotal"]
        self.metric = Metric.parse(self.header["metric"])
        # the corpus stays on disk; numpy only pages what is indexed
        self.db = np.load(os.path.join(dirpath, "db.npy"), mmap_mode="r")
        self.vec_ids = np.load(os.path.join(dirpath, "vec_ids.npy"),
                               mmap_mode="r")
        self.centroids = np.load(os.path.join(dirpath, "centroids.npy"))
        self._cents = jnp.asarray(self.centroids)
        self._cent_sq = sqnorms(self._cents)

    def _coarse(self, q: jax.Array, nprobe: int):
        scores = pairwise_scores(q, self._cents, self.metric,
                                 y_sqnorms=self._cent_sq)
        ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        return topk_scores(scores, ids, nprobe, self.metric)

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def search(self, q: np.ndarray, k: int, nprobe: int = 8):
        """Fixed-nprobe search: device coarse rank -> page + upload the
        deduplicated probed lists -> device scan. Never touches lists the
        batch does not probe."""
        q = np.asarray(q, np.float32)
        nprobe = min(nprobe, self.nlist)
        qd = jnp.asarray(q)
        _, cids = self._coarse(qd, nprobe)
        cids = np.asarray(cids)
        uniq, inv = np.unique(cids, return_inverse=True)
        nb = self._bucket(uniq.size)
        cap = self.db.shape[1]
        blocks = np.zeros((nb, cap, self.d), np.float32)
        block_ids = np.full((nb, cap), -1, np.int32)
        # this indexing is what pages the touched lists from disk
        blocks[: uniq.size] = self.db[uniq]
        block_ids[: uniq.size] = self.vec_ids[uniq]
        probe = inv.reshape(cids.shape).astype(np.int32)
        vals, ids = _scan_uploaded(
            jnp.asarray(blocks), jnp.asarray(block_ids), self._cents,
            self._cent_sq, qd, jnp.asarray(probe), nprobe, k, self.metric)
        return np.asarray(vals), np.asarray(ids).astype(np.int64)
