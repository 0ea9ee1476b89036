"""Summarize a jax.profiler trace: top self-time ops on the device.

Usage: python scripts/profile_top_ops.py /tmp/prof_b3 [N] [--by-module|--copies]

Parses the trace-viewer JSON (<dir>/plugins/profile/<run>/*.trace.json.gz)
and prints the top-N device ops by total duration, plus a fused-op category
rollup — the "name the top time sinks" evidence for BENCH.md (round-1
VERDICT item 4).

``--copies`` lists the top explicit layout-change ops (copy/transpose/
bitcast) with their jax scope and full HLO line — the source/destination
tile layouts (``{perm:T(8,128)}``) show exactly which re-tiling XLA
inserted and between which producer/consumer (BENCH.md tile-occupancy
analysis evidence).

``--by-module`` instead rolls device time up by the op's jax scope path
(the trace's ``tf_op`` metadata — e.g. ``DynamoModel.predict_depths/
depth_enc/stem1_1``), separating forward (``jvp``) from backward
(``transpose(jvp)``). This is the "tf_op rollup" BENCH.md's per-module
attributions (formulation studies, model-time breakdown) come from.
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load_trace(trace_dir):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def classify(name):
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    for k in ("convolution", "conv"):
        if k in n:
            return "convolution"
    for k in ("dot", "matmul", "einsum"):
        if k in n:
            return "matmul"
    if "gather" in n:
        return "gather"
    if "scatter" in n:
        return "scatter"
    if "reduce-window" in n or "reduce_window" in n:
        return "reduce-window"
    if "all-reduce" in n or "psum" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "sort" in n:
        return "sort"
    if "rng" in n:
        return "rng"
    return "other"


def rollup_by_module(events, device_pids, tid_name, topn, steps=None):
    """Group device-op time by jax scope (tf_op metadata), fwd vs bwd.

    ``steps``: if given, also print ms/step (the bench traces hold 50 steps).
    """
    by_scope = defaultdict(float)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        if "Ops" not in tid_name.get((ev["pid"], ev.get("tid")), ""):
            continue
        top = (ev.get("args") or {}).get("tf_op") or ""
        direction = "bwd" if "transpose" in top else "fwd"
        m = re.search(
            r"(predict_(?:depths|motions|poses)/[^/]+(?:/[^/]+)?)", top)
        if m:
            comp = m.group(1)
        else:
            # strip jit()/jvp()/transpose() wrappers, keep 2 scope levels
            parts = [p for p in top.split("/")
                     if p and not re.match(r"(jit|jvp|transpose|vmap)\(", p)]
            comp = "/".join(parts[:2]) if parts else "<unattributed>"
        by_scope[(direction, comp)] += ev.get("dur", 0) / 1e3
    total = sum(by_scope.values())
    print(f"total device op time: {total:.2f} ms across {len(by_scope)} scopes")
    per_step = f" ({'ms/step':>8})" if steps else ""
    print(f"{'ms':>9} {'%':>6}{per_step}  dir scope")
    for (direction, comp), ms in sorted(by_scope.items(), key=lambda kv: -kv[1])[:topn]:
        extra = f" ({ms / steps:8.3f})" if steps else ""
        print(f"{ms:9.3f} {100 * ms / total:6.2f}{extra}  {direction} {comp}")


def rollup_copies(events, device_pids, tid_name, topn, steps=None):
    """Top explicit layout-change ops with scope + HLO layout detail."""
    by = defaultdict(lambda: [0.0, 0, "", ""])
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        if "Ops" not in tid_name.get((ev["pid"], ev.get("tid")), ""):
            continue
        name = ev.get("name", "")
        if not (name.startswith("copy") or "transpose" in name
                or name.startswith("bitcast")):
            continue
        args = ev.get("args") or {}
        rec = by[name]
        rec[0] += ev.get("dur", 0) / 1e3
        rec[1] += 1
        rec[2] = (args.get("tf_op") or "")[:90]
        rec[3] = (args.get("long_name") or args.get("hlo_op") or "")[:150]
    total = sum(v[0] for v in by.values())
    print(f"total explicit copy/transpose: {total:.2f} ms"
          + (f" ({total / steps:.2f} ms/step)" if steps else ""))
    for name, (ms, n, scope, hlo) in sorted(by.items(), key=lambda kv: -kv[1][0])[:topn]:
        per = f" ({ms / steps:6.3f}/step)" if steps else ""
        print(f"{ms:8.2f} ms{per} n={n:3d} {name:26s} {scope}")
        if hlo:
            print(f"           {hlo}")


def main():
    argv = [a for a in sys.argv[1:] if a not in ("--by-module", "--copies")]
    by_module = "--by-module" in sys.argv
    copies = "--copies" in sys.argv
    trace_dir = argv[0]
    topn = int(argv[1]) if len(argv) > 1 else 25
    data = load_trace(trace_dir)
    events = data["traceEvents"]

    # Device events live under pids whose process_name mentions TPU/device.
    pid_name = {}
    tid_name = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("name") == "thread_name":
                tid_name[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")

    device_pids = {p for p, n in pid_name.items()
                   if re.search(r"tpu|device|/device", n, re.I) and "host" not in n.lower()}

    if by_module or copies:
        # Derive the profiled-step count as the MODE of per-op-name event
        # counts on the device: most distinct HLO ops execute exactly once
        # per step, so the most common count is the step count. (The earlier
        # "Steps"-thread tally over-counted 4x on the axon deployment — it
        # emits multiple step markers per execution; caught round 4 when op
        # n=58 disagreed with Steps=232.) Fallback 60 = bench.py's n1+n2.
        name_counts = defaultdict(int)
        for ev in events:
            if ev.get("ph") == "X" and ev.get("pid") in device_pids:
                name_counts[ev.get("name", "")] += 1
        mode_counts = defaultdict(int)
        for n in name_counts.values():
            mode_counts[n] += 1
        steps = max(mode_counts.items(), key=lambda kv: kv[1])[0] if mode_counts else 60
        print(f"(per-step figures divide by {steps} profiled steps)")
        if by_module:
            rollup_by_module(events, device_pids, tid_name, topn, steps=steps)
        else:
            rollup_copies(events, device_pids, tid_name, topn, steps=steps)
        return

    by_op = defaultdict(float)
    count = defaultdict(int)
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = tid_name.get((ev["pid"], ev.get("tid")), "")
        # Only the XLA-op-level lines (skip step/scope rollup lines).
        if "XLA Op" not in tname and "XLA Ops" not in tname and "Ops" not in tname:
            continue
        by_op[ev["name"]] += ev.get("dur", 0) / 1e3  # us -> ms
        count[ev["name"]] += 1

    if not by_op:
        print("process names seen:", sorted(set(pid_name.values())))
        print("thread names seen:", sorted(set(tid_name.values()))[:20])
        raise SystemExit("no device op events matched")

    total = sum(by_op.values())
    print(f"total device op time: {total:.2f} ms across {len(by_op)} distinct ops")
    ranked = sorted(by_op.items(), key=lambda kv: -kv[1])
    print(f"{'ms':>9} {'%':>6} {'n':>5}  op")
    for name, ms in ranked[:topn]:
        print(f"{ms:9.3f} {100*ms/total:6.2f} {count[name]:5d}  {name[:110]}")

    by_cat = defaultdict(float)
    for name, ms in by_op.items():
        by_cat[classify(name)] += ms
    print("\ncategory rollup:")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.3f} {100*ms/total:6.2f}  {cat}")


if __name__ == "__main__":
    main()
