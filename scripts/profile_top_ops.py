"""Summarize a jax.profiler trace: top self-time ops on the device.

Usage: python scripts/profile_top_ops.py /tmp/prof_b3 [N]

Parses the xplane.pb under <dir>/plugins/profile/<run>/ with
tensorboard_plugin_profile and prints the top-N HLO ops by total self time,
grouped by op category — the "name the top-3 time sinks" evidence for
BENCH.md (round-1 VERDICT item 4).
"""

import glob
import sys
from collections import defaultdict

from tensorboard_plugin_profile.protobuf import xplane_pb2


def load_xplane(trace_dir):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main():
    trace_dir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs = load_xplane(trace_dir)

    # Find device planes (TPU). Host plane is "/host:CPU".
    total_by_op = defaultdict(float)
    cat_by_op = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA op lines carry per-op events; step lines etc. are skipped by
            # only counting lines whose events map to HLO metadata names.
            for ev in line.events:
                name = ev_md.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                cat = None
                for st in ev.stats:
                    sname = stat_md.get(st.metadata_id, "")
                    if sname in ("hlo_category", "tf_op", "hlo_op"):
                        if st.HasField("str_metadata_id"):
                            continue
                        if st.HasField("str_value"):
                            cat = cat or st.str_value
                if "XLA Op" in line.name or "XLA Ops" in line.name:
                    total_by_op[name] += dur
                    if cat:
                        cat_by_op[name] = cat

    if not total_by_op:
        # fallback: accumulate every device line
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_md = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    total_by_op[f"{line.name}:{ev_md.get(ev.metadata_id, '?')}"] += (
                        ev.duration_ps / 1e9
                    )

    total = sum(total_by_op.values())
    print(f"total device op time: {total:.2f} ms across {len(total_by_op)} ops")
    ranked = sorted(total_by_op.items(), key=lambda kv: -kv[1])
    print(f"{'ms':>9} {'%':>6}  op [category]")
    for name, ms in ranked[:topn]:
        print(f"{ms:9.3f} {100*ms/total:6.2f}  {name} [{cat_by_op.get(name, '-')}]")

    # Category rollup.
    by_cat = defaultdict(float)
    for name, ms in total_by_op.items():
        by_cat[cat_by_op.get(name, "uncategorized")] += ms
    print("\ncategory rollup:")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.3f} {100*ms/total:6.2f}  {cat}")


if __name__ == "__main__":
    main()
