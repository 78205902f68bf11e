"""Regenerate all figure families from the eval logs in the repo root
(reference figures/* reproduce from *_Latency_*.log etc.; nothing is
hardcoded — a missing log skips its figure with a note).

Usage: python scripts/make_figs.py [out_dir]   (default figs_r3/)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from auncel_tpu.figures import plots  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "figs_r3")
os.makedirs(OUT, exist_ok=True)


def p(*parts):
    return os.path.join(ROOT, *parts)


def have(path):
    if os.path.exists(path):
        return True
    print(f"skip (no log): {path}")
    return False


lat = {f"k={k}, eps={e}%": p(f"Auncel_Latency_synth100K_{k}_{e}.log")
       for k in (10, 50, 100) for e in (1, 5, 10)}
lat = {k: v for k, v in lat.items() if os.path.exists(v)}
if lat:
    plots.latency_cdf(lat, os.path.join(OUT, "latency_cdf.png"),
                      title="synth100K bounded-search latency")
    print("latency_cdf.png")

# round-4: per-dataset latency CDFs + ELP slowdown figures (fig 10-12
# evidence shape, figures/overall/figure10-1.py:36-80)
for db in ("synth1M", "synthHard1M", "synthDeep10M"):
    a = p(f"Auncel_Latency_{db}_10_10.log")
    e = p(f"ELP_Latency_{db}_10_10.log")
    if os.path.exists(a):
        d = {"Auncel": a}
        if os.path.exists(e):
            d["ELP (worst-case tuned)"] = e
        plots.latency_cdf(d, os.path.join(OUT, f"latency_cdf_{db}.png"),
                          title=f"{db} k=10 eps=10% "
                                "(incl. ~40ms tunnel RTT)")
        print(f"latency_cdf_{db}.png")
    if os.path.exists(a) and os.path.exists(e):
        sl = plots.latency_slowdown(
            e, a, os.path.join(OUT, f"slowdown_{db}.png"),
            label="ELP / Auncel")
        print(f"slowdown_{db}.png (mean slowdown {sl:.2f}x)")

for db in ("synthHard1M", "synthDeep10M"):
    if have(p(f"Effective_error_{db}.log")):
        plots.bound_satisfaction(
            p(f"Effective_error_{db}.log"),
            os.path.join(OUT, f"bound_satisfaction_{db}.png"))
        print(f"bound_satisfaction_{db}.png")
    if have(p(f"Effective_time_{db}.log")):
        plots.time_budget(p(f"Effective_time_{db}.log"),
                          os.path.join(OUT, f"time_budget_{db}.png"))
        print(f"time_budget_{db}.png")

if have(p("Effective_error_synth100K.log")):
    plots.bound_satisfaction(p("Effective_error_synth100K.log"),
                             os.path.join(OUT, "bound_satisfaction.png"))
    print("bound_satisfaction.png")

if have(p("Effective_time_synth100K.log")):
    plots.time_budget(p("Effective_time_synth100K.log"),
                      os.path.join(OUT, "time_budget.png"))
    print("time_budget.png")

if have(p("Calib_margin_synthHard1M.log")):
    plots.calib_margin(p("Calib_margin_synthHard1M.log"),
                       os.path.join(OUT, "calib_margin.png"))
    print("calib_margin.png")

if have(p("Dist_scaling.log")):
    rows = [l.split() for l in open(p("Dist_scaling.log")) if l.strip()]
    plots.dist_scaling([int(r[0]) for r in rows],
                       [float(r[1]) for r in rows],
                       os.path.join(OUT, "dist_scaling.png"))
    print("dist_scaling.png")
