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
    desc = description.strip()
    if desc == "Flat":
        return FlatIndex(d, metric)
    m = re.fullmatch(r"IVF(\d+),(\w+)", desc)
    if m:
        nlist = int(m.group(1))
        cell = m.group(2)
        if cell == "Flat":
            return IVFFlatIndex(d, nlist, metric)
        raise NotImplementedError(
            f"IVF cell type {cell!r} not implemented yet "
            f"(reference grammar: AutoTune.cpp:741-960)")
    raise NotImplementedError(f"factory description {description!r}")
