"""Index factory string grammar.

Parity with the subset of the reference ``index_factory`` grammar
(``/root/reference/Auncel/AutoTune.cpp:741-960``) that Auncel's eval path
uses ("IVF1024,Flat", "Flat"); unsupported cells raise with the cell name so
the gap is explicit rather than silent.
"""

import re

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex


def index_factory(d: int, description: str,
                  metric: Metric = Metric.L2) -> Index:
    metric = Metric.parse(metric)
    parts = [p.strip() for p in description.strip().split(",")]

    # Leading transform prefixes (AutoTune.cpp:760-800: PCA/PCAR/RR/L2norm).
    transforms = []
    cur_d = d
    while parts:
        p = parts[0]
        m = re.fullmatch(r"PCA(R?)(\d+)", p)
        if m:
            from auncel_tpu.index.transform import PCAMatrix
            transforms.append(PCAMatrix(cur_d, int(m.group(2)),
                                        random_rotation=bool(m.group(1))))
            cur_d = int(m.group(2))
            parts.pop(0)
            continue
        m = re.fullmatch(r"OPQ(\d+)", p)
        if m:
            from auncel_tpu.index.transform import OPQMatrix
            transforms.append(OPQMatrix(cur_d, int(m.group(1))))
            parts.pop(0)
            continue
        if p == "L2norm":
            from auncel_tpu.index.transform import NormalizationTransform
            transforms.append(NormalizationTransform(cur_d))
            parts.pop(0)
            continue
        if re.fullmatch(r"RR(\d+)?", p):
            from auncel_tpu.index.transform import RandomRotationMatrix
            transforms.append(RandomRotationMatrix(cur_d))
            parts.pop(0)
            continue
        break

    # "IDMap" token (AutoTune.cpp:812-816,919-925): wrap the final index
    # so arbitrary user ids can be added.
    want_idmap = "IDMap" in parts
    parts = [p for p in parts if p != "IDMap"]
    # trailing "RFlat" cell (AutoTune.cpp:911-918): exact re-rank wrapper.
    want_rflat = bool(parts) and parts[-1] == "RFlat"
    if want_rflat:
        parts = parts[:-1]

    desc = ",".join(parts)
    if desc == "Flat":
        index: Index = FlatIndex(cur_d, metric)
    elif re.fullmatch(r"HNSW(\d+)?(,Flat)?", desc):
        # standalone graph index (AutoTune.cpp:888-905 "HNSW%d" cell)
        m = re.fullmatch(r"HNSW(\d+)?(,Flat)?", desc)
        from auncel_tpu.index.hnsw import HNSWIndex
        index = HNSWIndex(cur_d, M=int(m.group(1) or 32), metric=metric)
    elif re.fullmatch(r"HNSW(\d+)_SQ8", desc):
        # compressed-storage graph (AutoTune.cpp:908-910; SQ8 only there)
        m = re.fullmatch(r"HNSW(\d+)_SQ8", desc)
        from auncel_tpu.index.hnsw import IndexHNSWSQ
        index = IndexHNSWSQ(cur_d, M=int(m.group(1)), metric=metric)
    elif re.fullmatch(r"HNSW(\d+)_PQ(\d+)", desc):
        # PQ-coded graph storage (AutoTune.cpp:902-904)
        m = re.fullmatch(r"HNSW(\d+)_PQ(\d+)", desc)
        from auncel_tpu.index.hnsw import IndexHNSWPQ
        index = IndexHNSWPQ(cur_d, pq_m=int(m.group(2)),
                            M=int(m.group(1)), metric=metric)
    elif re.fullmatch(r"HNSW(\d+)_(\d+)\+PQ(\d+)", desc):
        # graph over 2-level codes, k-means coarse (AutoTune.cpp:886-891)
        m = re.fullmatch(r"HNSW(\d+)_(\d+)\+PQ(\d+)", desc)
        from auncel_tpu.index.hnsw import IndexHNSW2Level
        index = IndexHNSW2Level(cur_d, nlist=int(m.group(2)),
                                pq_m=int(m.group(3)), M=int(m.group(1)),
                                metric=metric)
    elif re.fullmatch(r"HNSW(\d+)_2x(\d+)\+PQ(\d+)", desc):
        # graph over 2-level codes, IMI product coarse (AutoTune.cpp:893-899)
        m = re.fullmatch(r"HNSW(\d+)_2x(\d+)\+PQ(\d+)", desc)
        from auncel_tpu.index.hnsw import IndexHNSW2Level
        from auncel_tpu.index.twolayer import IMICoarseQuantizer
        nbit = int(m.group(2))
        index = IndexHNSW2Level(
            cur_d, nlist=(1 << nbit) ** 2, pq_m=int(m.group(3)),
            M=int(m.group(1)), metric=metric,
            quantizer=IMICoarseQuantizer(cur_d, nbit, metric))
    elif re.fullmatch(r"PQ(\d+)", desc):
        # standalone PQ index (AutoTune.cpp:906-918 "PQ%d" cell)
        from auncel_tpu.index.pq_index import IndexPQ
        index = IndexPQ(cur_d, M=int(desc[2:]), metric=metric)
    elif desc in ("SQ8", "SQ4", "SQ6", "SQfp16", "SQbf16"):
        # standalone scalar-quantized flat index (the reference's
        # "SQ8"/"SQ4"/"SQfp16" cells -> IndexScalarQuantizer,
        # AutoTune.cpp factory; fp16 maps to the TPU-native bf16; SQ6 is
        # the QT_6bit codec, IndexScalarQuantizer.h:41)
        from auncel_tpu.index.flat import IndexScalarQuantizer
        qt = {"SQ8": "sq8", "SQ4": "sq4", "SQ6": "sq6",
              "SQfp16": "bf16", "SQbf16": "bf16"}[desc]
        index = IndexScalarQuantizer(cur_d, qtype=qt, metric=metric)
    elif re.fullmatch(r"LSH(\d+)?(r)?(t)?", desc):
        # sign-bit signatures; r = rotate input, t = train thresholds
        # (IndexLSH.h:21; later-faiss factory syntax)
        m = re.fullmatch(r"LSH(\d+)?(r)?(t)?", desc)
        from auncel_tpu.index.lsh import IndexLSH
        index = IndexLSH(cur_d, nbits=int(m.group(1) or cur_d),
                         rotate_data=bool(m.group(2)),
                         train_thresholds=bool(m.group(3)))
    elif re.fullmatch(r"IVF(\d+),SH(\d+)?", desc):
        # IVF over spectral-hash codes (IndexIVFSpectralHash.h:30)
        m = re.fullmatch(r"IVF(\d+),SH(\d+)?", desc)
        from auncel_tpu.index.lsh import IVFSpectralHashIndex
        index = IVFSpectralHashIndex(cur_d, nlist=int(m.group(1)),
                                     nbit=int(m.group(2) or cur_d))
    elif re.fullmatch(r"IVF(\d+),PQ(\d+)\+(\d+)", desc):
        # IVFPQ + refinement PQ re-rank (AutoTune.cpp:854-866 "PQ%d+%d";
        # rejected under inner product there, mirrored in IndexIVFPQR)
        m = re.fullmatch(r"IVF(\d+),PQ(\d+)\+(\d+)", desc)
        from auncel_tpu.index.ivfpqr import IndexIVFPQR
        index = IndexIVFPQR(cur_d, int(m.group(1)), M=int(m.group(2)),
                            M_refine=int(m.group(3)), metric=metric)
    else:
        coarse = "kmeans"
        m = re.fullmatch(r"IMI2x(\d+),(\w+)", desc)
        if m:
            # inverted multi-index coarse cells (AutoTune.cpp:807):
            # nlist = (2^nbit)^2 product cells
            nlist = (1 << int(m.group(1))) ** 2
            hnsw_m = None
            cell = m.group(2)
            coarse = "imi"
        else:
            m = re.fullmatch(r"IVF(\d+)(?:_HNSW(\d+))?,(\w+)", desc)
            if not m:
                raise NotImplementedError(
                    f"factory description {description!r}")
            nlist = int(m.group(1))
            hnsw_m = int(m.group(2)) if m.group(2) else None
            cell = m.group(3)
        if cell == "Flat":
            index = IVFFlatIndex(cur_d, nlist, metric, coarse=coarse)
        elif cell == "SQ8":
            index = IVFFlatIndex(cur_d, nlist, metric, storage="sq8",
                                 coarse=coarse)
        elif cell == "SQ4":
            index = IVFFlatIndex(cur_d, nlist, metric, storage="sq4",
                                 coarse=coarse)
        elif cell == "SQ6":
            index = IVFFlatIndex(cur_d, nlist, metric, storage="sq6",
                                 coarse=coarse)
        elif cell in ("SQfp16", "SQbf16"):
            # bf16 is the TPU-native half type; stands in for the
            # reference's SQfp16 cell
            index = IVFFlatIndex(cur_d, nlist, metric, storage="bf16",
                                 coarse=coarse)
        elif re.fullmatch(r"PQ\d+", cell):
            m_sub = int(cell[2:])
            if cur_d % m_sub != 0:
                raise ValueError(f"PQ{m_sub}: d={cur_d} not divisible")
            index = IVFFlatIndex(cur_d, nlist, metric,
                                 storage=f"pq{m_sub}", coarse=coarse)
        else:
            raise NotImplementedError(
                f"IVF cell type {cell!r} not implemented yet "
                f"(reference grammar: AutoTune.cpp:741-960)")
        if hnsw_m is not None:
            # IVF%d_HNSW%d (AutoTune.cpp:807-820): rank centroids through
            # an HNSW graph instead of brute force. On the MXU brute force
            # wins up to nlist ~16k, so this matters for very large nlist;
            # tuned (error-bound) mode needs the full exact ranking and
            # ignores the graph quantizer, like the reference grammar
            # implies (coarse quantizers are out of the tuned path).
            index.coarse_hnsw_m = hnsw_m

    if want_rflat:
        from auncel_tpu.index.flat import IndexRefineFlat
        index = IndexRefineFlat(index)
    if want_idmap:
        from auncel_tpu.index.meta import IndexIDMap
        index = IndexIDMap(index)
    if transforms:
        from auncel_tpu.index.transform import IndexPreTransform
        return IndexPreTransform(index, transforms)
    return index
