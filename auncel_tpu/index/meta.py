"""Meta indexes: ID mapping, in-process sharding, replication.

Capability parity with the reference's ``MetaIndexes``/``IndexShards``/
``IndexReplicas`` (SURVEY.md §2 #20, ``IndexShards.h:20``): an IndexShards
fans a query out to all sub-indexes and merges the top-k; IndexReplicas
round-robins whole queries across identical replicas; IndexIDMap remaps
sequential ids to user ids.

TPU note: these are *host-side composition* utilities (the reference runs
them on a thread pool). Device-mesh scale-out lives in
``auncel_tpu.parallel.sharded``; these cover the single-process API surface
(e.g. sharding across indexes with different configurations, or wrapping an
index that lacks add_with_ids)."""

import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu import native


class IndexIDMap(Index):
    """Remaps sequential ids to arbitrary user ids (MetaIndexes.h)."""

    def __init__(self, sub: Index):
        self.sub = sub
        self.d = sub.d
        self.metric = sub.metric
        self._ids = np.zeros(0, np.int64)

    @property
    def is_trained(self):
        return self.sub.is_trained

    @is_trained.setter
    def is_trained(self, v):  # pragma: no cover - keeps Index contract
        pass

    @property
    def ntotal(self):
        return self.sub.ntotal

    def train(self, x):
        self.sub.train(x)

    def add(self, x, ids=None):
        assert ids is not None, "IndexIDMap exists to carry user ids"
        self._ids = np.concatenate([self._ids, np.asarray(ids, np.int64)])
        self.sub.add(x)

    def search(self, q, k, **sub_kwargs):
        # pass-through knobs (nprobe, ...) reach the wrapped index like
        # the reference ParameterSpace recursing into IndexIDMap
        # (AutoTune.cpp:505-508)
        vals, ids = self.sub.search(q, k, **sub_kwargs)
        mapped = np.where(ids >= 0, self._ids[np.maximum(ids, 0)], -1)
        return vals, mapped

    def reset(self):
        self.sub.reset()
        self._ids = np.zeros(0, np.int64)

    def remove_ids(self, selector) -> int:
        """Remove by USER id (reference IndexIDMap::remove_ids,
        MetaIndexes.cpp — the selector matches the remapped ids, then the
        wrapped index drops the corresponding positions). Rebuilds the
        sub-index from its decoded vectors, the same route
        aux.remove_ids takes for storage codecs."""
        keep = ~selector.is_member(self._ids)
        removed = int((~keep).sum())
        if removed == 0:
            return 0
        x = self.sub.reconstruct_n(0, self.sub.ntotal)
        from auncel_tpu.index.ivf import preserve_sq_range
        preserve_sq_range(self.sub)   # keep SQ codes bit-stable
        self.sub.reset()
        if keep.any():
            self.sub.add(x[keep])
        self._ids = self._ids[keep]
        return removed


class IndexIDMap2(IndexIDMap):
    """IndexIDMap with an id -> sequential-position reverse map for
    efficient reconstruction by user id (MetaIndexes.h:59-77:
    ``rev_map`` + ``reconstruct``)."""

    def __init__(self, sub: Index):
        super().__init__(sub)
        self._rev: dict[int, int] = {}

    def construct_rev_map(self) -> None:
        """Rebuild the reverse map from scratch (MetaIndexes.cpp
        ``construct_rev_map``) — e.g. after loading state."""
        self._rev = {int(u): i for i, u in enumerate(self._ids)}

    def add(self, x, ids=None):
        base = self._ids.shape[0]
        super().add(x, ids)
        for i, u in enumerate(self._ids[base:]):
            self._rev[int(u)] = base + i

    def reconstruct(self, key: int) -> np.ndarray:
        """Decode the stored vector for user id ``key`` via the reverse
        map (one dict lookup, not a scan of _ids)."""
        pos = self._rev.get(int(key))
        if pos is None:
            raise KeyError(f"id {key} not in IndexIDMap2")
        return self.sub.reconstruct(pos)

    def remove_ids(self, selector) -> int:
        removed = super().remove_ids(selector)
        if removed:
            self.construct_rev_map()   # positions renumbered
        return removed

    def reset(self):
        super().reset()
        self._rev = {}


class IndexShards(Index):
    """Fan out to every shard, merge top-k by value (IndexShards.h:20).
    successive_ids: shard i's ids are offset by the preceding shards'
    ntotal (the reference's flag of the same name)."""

    def __init__(self, d: int, metric: Metric = Metric.L2,
                 successive_ids: bool = True):
        self.d = d
        self.metric = Metric.parse(metric)
        self.successive_ids = successive_ids
        self.shards: list[Index] = []
        # per-shard position -> global id (for position-keyed shards)
        self._pos_maps: list[np.ndarray] = []

    @property
    def is_trained(self):
        return all(s.is_trained for s in self.shards)

    @is_trained.setter
    def is_trained(self, v):  # pragma: no cover
        pass

    @property
    def ntotal(self):
        return sum(s.ntotal for s in self.shards)

    def add_shard(self, index: Index):
        assert index.d == self.d and index.metric is self.metric
        self.shards.append(index)
        self._pos_maps.append(np.zeros((0,), np.int64))

    def train(self, x):
        for s in self.shards:
            s.train(x)

    def add(self, x, ids=None):
        """Round-robin rows across shards (like dist/split.cpp)."""
        assert self.shards, "add_shard first"
        n = x.shape[0]
        base = self.ntotal
        if ids is None:
            ids = np.arange(base, base + n, dtype=np.int64)
        ids = np.asarray(ids, np.int64)
        for i, s in enumerate(self.shards):
            sel = slice(i, None, len(self.shards))
            if self._position_keyed(s):
                # position-keyed shards return storage positions; record
                # the global id of every position so search can translate
                # (a stride formula breaks as soon as one add's size is
                # not a multiple of nshards: later adds restart at shard 0
                # while per-shard positions have drifted)
                s.add(x[sel])
                self._pos_maps[i] = np.concatenate(
                    [self._pos_maps[i], ids[sel]])
            else:
                s.add(x[sel], ids=ids[sel])

    @staticmethod
    def _position_keyed(s) -> bool:
        """Capability flag instead of class-name dispatch: a shard that
        stores sequential position ids (FlatIndex) needs IndexShards to
        translate its results back to global ids."""
        return bool(getattr(s, "position_keyed_ids", False))

    def search(self, q, k):
        all_v, all_i = [], []
        for i, s in enumerate(self.shards):
            v, idx = s.search(q, k)
            if self.successive_ids and self._position_keyed(s):
                pm = self._pos_maps[i]
                idx = np.where(idx >= 0,
                               pm[np.clip(idx, 0, max(len(pm) - 1, 0))],
                               -1)
            all_v.append(v)
            all_i.append(idx)
        vals = np.stack(all_v)
        ids = np.stack(all_i).astype(np.int64)
        return native.kway_merge_topk(vals, ids,
                                      self.metric.lower_is_better)

    def reset(self):
        for s in self.shards:
            s.reset()
        self._pos_maps = [np.zeros((0,), np.int64) for _ in self.shards]


class IndexSplitVectors(Index):
    """Dimension-sliced federation (reference ``IndexSplitVectors``,
    MetaIndexes.h:82 / MetaIndexes.cpp:224-297): each sub-index owns a
    contiguous slice of the input dimensions; a k=1 search runs every
    sub-index on its slice and composes the result as a multi-index
    quantizer cell — label = sum(label_i * prod(ntotal of earlier subs)),
    distance = sum of sub-distances. ``add``/``train`` are unsupported,
    matching the reference (sub-indexes are populated directly)."""

    def __init__(self, d: int, threaded: bool = False):
        self.d = d
        self.threaded = threaded  # API parity; composition is host-side
        self.metric = Metric.L2
        self.sub_indexes: list[Index] = []
        self.sum_d = 0
        self.is_trained = True

    @property
    def ntotal(self):
        if not self.sub_indexes:
            return 0
        n = 1
        for s in self.sub_indexes:
            n *= s.ntotal
        return n

    def add_sub_index(self, index: Index):
        self.sub_indexes.append(index)
        self.sum_d += index.d

    def add(self, x, ids=None):
        raise NotImplementedError(
            "IndexSplitVectors: add sub-indexes, not vectors "
            "(MetaIndexes.cpp:218)")

    def train(self, x):
        raise NotImplementedError("not implemented (MetaIndexes.cpp:299)")

    def search(self, q, k):
        assert k == 1, "search implemented only for k=1 (reference parity)"
        assert self.sum_d == self.d, \
            "not enough indexes compared to # dimensions"
        q = np.asarray(q, np.float32)
        n = q.shape[0]
        vals = np.zeros((n, 1), np.float32)
        ids = np.zeros((n, 1), np.int64)
        ofs, factor = 0, 1
        for i, sub in enumerate(self.sub_indexes):
            v, lab = sub.search(q[:, ofs:ofs + sub.d], 1)
            lab = np.asarray(lab, np.int64)
            if i == 0:
                vals, ids = np.array(v), lab
            else:
                bad = (ids < 0) | (lab < 0)
                ids = np.where(bad, -1, ids + lab * factor)
                vals = np.where(bad, np.nan, vals + v)
            ofs += sub.d
            factor *= sub.ntotal
        return vals, ids

    def reset(self):
        for s in self.sub_indexes:
            s.reset()


class IndexReplicas(Index):
    """Round-robin queries across identical replicas (IndexReplicas.h).
    On a single host this is a throughput construct; results from any
    replica are equivalent."""

    def __init__(self, d: int, metric: Metric = Metric.L2):
        self.d = d
        self.metric = Metric.parse(metric)
        self.replicas: list[Index] = []
        self._next = 0

    @property
    def is_trained(self):
        return all(r.is_trained for r in self.replicas)

    @is_trained.setter
    def is_trained(self, v):  # pragma: no cover
        pass

    @property
    def ntotal(self):
        return self.replicas[0].ntotal if self.replicas else 0

    def add_replica(self, index: Index):
        assert index.d == self.d
        self.replicas.append(index)

    def train(self, x):
        for r in self.replicas:
            r.train(x)

    def add(self, x, ids=None):
        for r in self.replicas:
            r.add(x, ids=ids) if ids is not None else r.add(x)

    def search(self, q, k):
        assert self.replicas
        r = self.replicas[self._next % len(self.replicas)]
        self._next += 1
        return r.search(q, k)

    def reset(self):
        for r in self.replicas:
            r.reset()
