"""Index serialization.

Capability parity with the reference's ``write_index``/``read_index``
(``/root/reference/Auncel/index_io.cpp``, fourcc binary format) for the index
types this framework implements — realized as a single .npz container (numpy's
zip format) holding the packed device arrays plus a small JSON header. The
reference's eval flow of caching a *trained-but-empty* index
(``eval/bound.cpp:265-268``, centroids only) is supported via
``save_index(index_without_adds)``.

Error profiles get their own save/load in ``auncel_tpu/profile/trace.py`` —
an improvement over the reference, which retrains profiles on every run
(SURVEY.md §5 checkpoint/resume).
"""

import json
import os

import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex

_FORMAT_VERSION = 1


def save_index(index: Index, path: str) -> None:
    if isinstance(index, FlatIndex):
        header = dict(version=_FORMAT_VERSION, kind="Flat", d=index.d,
                      metric=index.metric.value)
        np.savez(path, header=json.dumps(header), xb=index.xb)
        return
    from auncel_tpu.index.ivfpqr import IndexIVFPQR
    if isinstance(index, IndexIVFPQR):
        # EXACT serialization (both PQ stages' codes round-trip
        # bit-for-bit, like the reference's write_index for IndexIVFPQR,
        # index_io.cpp). The loaded index serves searches/reconstructions
        # identically; growing it needs the original vectors, so add()
        # after an exact-code load raises (our PQ trains at pack time,
        # unlike the reference's train-once codebooks).
        sorted_ids, pos, codes, books = index._ensure_refine()
        a = index.arrays
        header = dict(version=_FORMAT_VERSION, kind="IVFPQR", d=index.d,
                      metric=index.metric.value, nlist=index.nlist,
                      M=int(index.storage[2:]), M_refine=index.M_refine,
                      k_factor=index.k_factor, ntotal=index.ntotal)
        np.savez(path, header=json.dumps(header),
                 centroids=index.centroids,
                 db=np.asarray(a.db), vec_ids=np.asarray(a.vec_ids),
                 list_sizes=np.asarray(a.list_sizes),
                 pq_books=np.asarray(a.pq_codebooks),
                 refine_books=np.asarray(books),
                 refine_codes=np.asarray(codes),
                 refine_sorted_ids=np.asarray(sorted_ids),
                 refine_pos=np.asarray(pos))
        return
    if isinstance(index, IVFFlatIndex):
        from auncel_tpu.index.ivf import IVFFlatDedupIndex
        # Quantized indexes are serialized as their DECODED values: search
        # results round-trip exactly; PQ indexes reload as f32 storage
        # (retraining codebooks on decoded data would not reproduce codes
        # bit-for-bit). SQ indexes persist their affine range so the
        # reload re-encodes to IDENTICAL codes (re-training the range on
        # decoded data diverges whenever the range is wider than the
        # data, e.g. rangestat margins).
        storage = index.storage
        if storage.startswith("pq"):
            storage = "f32"
        dedup = isinstance(index, IVFFlatDedupIndex)
        header = dict(version=_FORMAT_VERSION,
                      kind="IVFFlatDedup" if dedup else "IVFFlat",
                      d=index.d,
                      metric=index.metric.value, nlist=index.nlist,
                      trained=index.is_trained, ntotal=index.ntotal,
                      storage=storage)
        if dedup:
            header["dup"] = {str(k): v for k, v in index._dup.items()}
        payload = dict(header=json.dumps(header))
        if index.is_trained:
            payload["centroids"] = index.centroids
        if index.ntotal:
            a = index.arrays
            db = np.asarray(a.db)
            if a.sq_scale is not None or a.pq_codebooks is not None:
                db = np.asarray(a.decode_block(a.db))
            payload["db"] = db.astype(np.float32)
            payload["vec_ids"] = np.asarray(a.vec_ids)
            payload["list_sizes"] = np.asarray(a.list_sizes)
            if a.sq_scale is not None:
                payload["sq_scale"] = np.asarray(a.sq_scale)
                payload["sq_bias"] = np.asarray(a.sq_bias)
        np.savez(path, **payload)
        return
    from auncel_tpu.index.twolayer import Index2Layer
    if isinstance(index, Index2Layer):
        # exact: codes round-trip bit-for-bit (reference write_index for
        # Index2Layer keeps codes too, index_io.cpp)
        header = dict(version=_FORMAT_VERSION, kind="2Layer", d=index.d,
                      metric=index.metric.value, nlist=index.nlist,
                      M=index.M, trained=index.is_trained)
        payload = dict(header=json.dumps(header))
        if index.is_trained:
            payload["centroids"] = index.centroids
            payload["books"] = np.asarray(index._pq.codebooks)
        payload["list_ids"] = index.list_ids
        payload["codes"] = index.codes
        np.savez(path, **payload)
        return
    from auncel_tpu.index.binary import (
        BinaryFlatIndex, BinaryIVFIndex, BinaryHNSWIndex, pack_bits)
    if isinstance(index, BinaryFlatIndex):
        # packed codes only (reference write_index_binary for
        # IndexBinaryFlat, index_io.cpp fourcc "IBxF" equivalent)
        header = dict(version=_FORMAT_VERSION, kind="BFlat", d=index.d,
                      metric=index.metric.value)
        np.savez(path, header=json.dumps(header), codes=index.codes)
        return
    if isinstance(index, BinaryIVFIndex):
        header = dict(version=_FORMAT_VERSION, kind="BIVF", d=index.d,
                      metric=index.metric.value, nlist=index.nlist,
                      nprobe=index.nprobe, trained=index.is_trained,
                      coarse_hnsw_m=index.coarse_hnsw_m)
        payload = dict(header=json.dumps(header), codes=index._codes)
        if index.is_trained:
            payload["centroid_bits"] = index.centroid_bits
        np.savez(path, **payload)
        return
    if isinstance(index, BinaryHNSWIndex):
        # packed codes + the frozen graph tables (reference
        # write_index_binary keeps the HNSW struct too)
        g = index._g
        if g.ntotal and not g._built:
            g.build()
        header = dict(version=_FORMAT_VERSION, kind="BHNSW", d=index.d,
                      metric=index.metric.value, M=g.M,
                      ef_search=g.ef_search,
                      entry=int(g.entry_point), max_level=int(g.max_level))
        codes = pack_bits(np.asarray(g._xb) > 0.5) if g.ntotal else \
            np.zeros((0, index.d // 8), np.uint8)
        payload = dict(header=json.dumps(header), codes=codes,
                       levels=(g.levels if g.levels is not None
                               else np.zeros((0,), np.int32)))
        for l, t in enumerate(g.nb_tables):
            payload[f"table{l}"] = t
        for l, gg in enumerate(g.g2u):
            payload[f"g2u{l}"] = gg
        np.savez(path, **payload)
        return
    raise NotImplementedError(f"cannot serialize {type(index).__name__}")


def save_index_ondisk(index: IVFFlatIndex, dirpath: str) -> None:
    """On-disk index directory (reference OnDiskInvertedLists capability,
    SURVEY.md §2 #8): the packed list tensor is stored as a raw .npy.
    Serve it WITHOUT materializing the corpus via
    ``auncel_tpu.index.ondisk.OnDiskIVFIndex`` (searches page only the
    probed lists from the mmap); ``load_index_ondisk`` below instead
    rebuilds a fully RAM/HBM-resident index from the same directory."""
    os.makedirs(dirpath, exist_ok=True)
    a = index.arrays
    db = np.asarray(a.db)
    if a.sq_scale is not None or a.pq_codebooks is not None:
        db = np.asarray(a.decode_block(a.db))
    np.save(os.path.join(dirpath, "db.npy"),
            np.ascontiguousarray(db, np.float32))
    np.save(os.path.join(dirpath, "vec_ids.npy"), np.asarray(a.vec_ids))
    np.save(os.path.join(dirpath, "list_sizes.npy"),
            np.asarray(a.list_sizes))
    np.save(os.path.join(dirpath, "centroids.npy"), index.centroids)
    header = dict(version=_FORMAT_VERSION, kind="IVFFlatOnDisk", d=index.d,
                  metric=index.metric.value, nlist=index.nlist,
                  ntotal=index.ntotal)
    with open(os.path.join(dirpath, "header.json"), "w") as f:
        json.dump(header, f)


def load_index_ondisk(dirpath: str) -> IVFFlatIndex:
    """Rebuild a fully RESIDENT IVFFlatIndex from an on-disk directory —
    this materializes the whole corpus (use when it fits; the bounded
    engine needs residency). For larger-than-RAM serving use
    ``OnDiskIVFIndex``, which streams probed lists per search."""
    with open(os.path.join(dirpath, "header.json")) as f:
        header = json.load(f)
    assert header["kind"] == "IVFFlatOnDisk"
    idx = IVFFlatIndex(header["d"], header["nlist"],
                       Metric.parse(header["metric"]))
    idx.set_centroids(np.load(os.path.join(dirpath, "centroids.npy")))
    db = np.load(os.path.join(dirpath, "db.npy"), mmap_mode="r")
    vec_ids = np.load(os.path.join(dirpath, "vec_ids.npy"), mmap_mode="r")
    mask = vec_ids >= 0
    idx.add(np.asarray(db[mask]), ids=np.asarray(vec_ids[mask],
                                                 np.int64))
    return idx


def load_index(path: str) -> Index:
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["header"]))
        metric = Metric.parse(header["metric"])
        if header["kind"] == "Flat":
            idx = FlatIndex(header["d"], metric)
            idx.add(z["xb"])
            return idx
        if header["kind"] in ("IVFFlat", "IVFFlatDedup"):
            from auncel_tpu.index.ivf import IVFFlatDedupIndex
            cls_ = (IVFFlatDedupIndex if header["kind"] == "IVFFlatDedup"
                    else IVFFlatIndex)
            idx = cls_(header["d"], header["nlist"], metric,
                       storage=header.get("storage", "f32"))
            if header["trained"]:
                idx.set_centroids(z["centroids"])
            if "sq_scale" in z:
                # reuse the saved affine range so codes round-trip
                # bit-for-bit
                idx._sq_range_override = (
                    np.asarray(z["sq_bias"], np.float32),
                    np.asarray(z["sq_scale"], np.float32))
            if header["ntotal"]:
                db = z["db"]
                vec_ids = z["vec_ids"]
                mask = vec_ids >= 0
                flat_x = db[mask]
                flat_ids = vec_ids[mask].astype(np.int64)
                if header["kind"] == "IVFFlatDedup":
                    # bypass re-dedup: stored rows are already unique
                    IVFFlatIndex.add(idx, flat_x, flat_ids)
                    idx._sig = {flat_x[r].tobytes(): int(flat_ids[r])
                                for r in range(len(flat_ids))}
                else:
                    idx.add(flat_x, flat_ids)
            if header["kind"] == "IVFFlatDedup":
                idx._dup = {int(k): list(v) for k, v in
                            header.get("dup", {}).items()}
            return idx
        if header["kind"] == "IVFPQR":
            from auncel_tpu.index.ivfpqr import IndexIVFPQR
            from auncel_tpu.index.scan import IVFArrays
            from auncel_tpu.ops.distance import sqnorms
            import jax.numpy as jnp
            idx = IndexIVFPQR(header["d"], header["nlist"],
                              M=header["M"], M_refine=header["M_refine"],
                              k_factor=header["k_factor"], metric=metric)
            idx.set_centroids(np.asarray(z["centroids"], np.float32))
            db = jnp.asarray(z["db"])
            vec_ids = jnp.asarray(z["vec_ids"])
            cents = jnp.asarray(idx.centroids)
            arrays = IVFArrays(
                centroids=cents, cent_sq=sqnorms(cents), db=db,
                db_sq=jnp.zeros(db.shape[:2], jnp.float32),
                vec_ids=vec_ids,
                list_sizes=jnp.asarray(z["list_sizes"]),
                interdis=(jnp.asarray(idx.interdis) if idx.interdis is
                          not None else jnp.zeros((1, 1), jnp.float32)),
                sq_scale=None, sq_bias=None,
                pq_codebooks=jnp.asarray(z["pq_books"]),
                pq_residual=())
            dec = arrays.decode_block(db)
            db_sq = jnp.sum(jnp.square(dec), -1) * (vec_ids >= 0)
            idx._arrays = arrays._replace(db_sq=db_sq)
            idx._ntotal = header["ntotal"]
            idx._refine = (np.asarray(z["refine_sorted_ids"]),
                           jnp.asarray(z["refine_pos"]),
                           jnp.asarray(z["refine_codes"]),
                           jnp.asarray(z["refine_books"]))
            idx._refine_of = idx._arrays
            idx._frozen_codes = True
            return idx
        if header["kind"] == "2Layer":
            from auncel_tpu.index.twolayer import Index2Layer
            from auncel_tpu.ops.pq import PQCodebooks
            import jax.numpy as jnp
            idx = Index2Layer(header["d"], header["nlist"],
                              M=header["M"], metric=metric)
            if header["trained"]:
                idx.centroids = np.asarray(z["centroids"], np.float32)
                idx._pq = PQCodebooks(jnp.asarray(z["books"]))
                idx.is_trained = True
            idx.list_ids = np.asarray(z["list_ids"], np.int32)
            idx.codes = np.asarray(z["codes"], np.uint8)
            return idx
        if header["kind"] == "BFlat":
            from auncel_tpu.index.binary import BinaryFlatIndex
            idx = BinaryFlatIndex(header["d"])
            if z["codes"].shape[0]:
                idx.add(np.asarray(z["codes"], np.uint8))
            return idx
        if header["kind"] == "BIVF":
            from auncel_tpu.index.binary import BinaryIVFIndex
            idx = BinaryIVFIndex(header["d"], header["nlist"],
                                 coarse_hnsw_m=header.get("coarse_hnsw_m"))
            idx.nprobe = header.get("nprobe", 1)
            if header["trained"]:
                idx.centroid_bits = np.asarray(z["centroid_bits"],
                                               np.uint8)
                idx.is_trained = True
            codes = np.asarray(z["codes"], np.uint8)
            if codes.shape[0]:
                idx.add(codes)
            return idx
        if header["kind"] == "BHNSW":
            from auncel_tpu.index.binary import (BinaryHNSWIndex,
                                                 unpack_bits)
            idx = BinaryHNSWIndex(header["d"], M=header["M"],
                                  ef_search=header["ef_search"])
            g = idx._g
            codes = np.asarray(z["codes"], np.uint8)
            if codes.shape[0]:
                g._xb = unpack_bits(codes, header["d"]).astype(np.float32)
                g.levels = np.asarray(z["levels"])
                g.entry_point = header["entry"]
                g.max_level = header["max_level"]
                g.nb_tables = [np.asarray(z[f"table{l}"])
                               for l in range(header["max_level"] + 1)]
                g.g2u = [np.asarray(z[f"g2u{l}"])
                         for l in range(header["max_level"] + 1)]
                g._push_dev()
                g._built = True
            return idx
    raise ValueError(f"unrecognized index file {path}")


def clone_index(index: Index) -> Index:
    """Deep, independent copy (reference ``clone_index``/``Cloner``,
    index_io.h:73). Device arrays are immutable in JAX so they are shared
    by reference — mutating operations (add/train/reset) on either copy
    repack their own state without touching the other."""
    import copy
    return copy.deepcopy(index)
