"""Dump the optimized HLO of the bench train step and (optionally) attribute
profiler trace ops to HLO instructions.

The v5e step profile names ops ``fusion.113`` / ``convert_reduce_fusion.4``
etc. (scripts/profile_top_ops.py); this tool compiles the SAME fine_tune
step as bench.py and writes ``compiled.as_text()`` so those names can be
grepped back to real instructions (root op, operand shapes, source
metadata). Usage:

    python scripts/dump_hlo.py --batch_size 8 --out /tmp/hlo_b8.txt
    python scripts/dump_hlo.py --batch_size 8 --out /tmp/hlo_b8.txt \
        --trace /tmp/prof_b8   # also print top-op -> HLO root attribution

Reference hot path being attributed: the warp + loss assembly of
``/root/reference/Trainer.py:215-411``.
"""

import argparse
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)

from __graft_entry__ import _FilteredStderr  # drop cpu_aot_loader cache spam


def build_compiled(batch_size, compute_dtype, image_dtype, depth_model):
    import jax.numpy as jnp

    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.training.trainer import Trainer, partition_params
    from __graft_entry__ import _synthetic_batch

    cfg = DynamoConfig(
        dataset="kitti", depth_model=depth_model, batch_size=batch_size,
        compute_dtype=compute_dtype, image_dtype=image_dtype,
        no_train_vis=True, num_devices=0,
    )
    trainer = Trainer(cfg)
    built = trainer._build_phase("fine_tune", steps_per_epoch=8000)
    t_params, f_params = partition_params(
        trainer.variables["params"], built["trainable_modules"])
    batch_stats = trainer.variables.get("batch_stats", {})
    opt_state = built["tx"].init(t_params)
    batch = trainer.put_batch(
        _synthetic_batch(cfg, trainer.global_B, cfg.height, cfg.width))
    return built["step_fn"].lower(
        t_params, f_params, batch_stats, opt_state, batch,
        jax.random.PRNGKey(0), jnp.int32(0),
    ).compile()


def top_trace_ops(trace_dir, n=40):
    """(name, total_ms, count) of the heaviest device ops in a profile dir."""
    import collections

    paths = []
    for root, _, files in os.walk(trace_dir):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith("trace.json.gz")]
    agg = collections.defaultdict(lambda: [0.0, 0])
    for p in paths:
        with gzip.open(p) as f:
            tr = json.load(f)
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and "name" in e:
                agg[e["name"]][0] += e.get("dur", 0) / 1e3
                agg[e["name"]][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    return [(k, v[0], v[1]) for k, v in rows[:n]]


def attribute(hlo_text, names):
    """Map trace op names to their HLO definition lines (first match)."""
    index = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if m:
            index.setdefault(m.group(1), line.strip())
    return {n: index.get(n) for n in names}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--image_dtype", default="auto")
    ap.add_argument("--depth_model", default="litemono")
    ap.add_argument("--out", default="/tmp/hlo_step.txt")
    ap.add_argument("--trace", default=None,
                    help="profile dir to attribute top ops against")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    with _FilteredStderr():
        compiled = build_compiled(args.batch_size, args.compute_dtype,
                                  args.image_dtype, args.depth_model)
    text = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"optimized HLO ({len(text.splitlines())} lines) -> {args.out}")

    if args.trace:
        rows = top_trace_ops(args.trace, n=args.top)
        attr = attribute(text, [r[0] for r in rows])
        steps = max((c for _, _, c in rows), default=1)
        # per-op event counts cluster at the true step count (the mode trick
        # from profile_top_ops.py); use the max which matches for hot ops
        print(f"\n{'ms/step':>9}  {'n':>5}  op -> HLO root")
        for name, ms, cnt in rows:
            line = attr.get(name) or "(not in this module: other executable?)"
            # keep the interesting part: root op + shape + metadata op_name
            m = re.search(r"= (.*?) (fusion|copy|convolution|gather|scatter|"
                          r"reduce|custom-call|convert|transpose|bitcast)", line)
            meta = re.search(r'metadata=\{[^}]*op_name="([^"]+)"', line)
            kind = re.search(r"kind=(\w+)", line)
            calls = re.search(r"calls=%?([\w.\-]+)", line)
            brief = line[:110] if line else line
            extra = " ".join(x for x in [
                f"kind={kind.group(1)}" if kind else "",
                f"calls={calls.group(1)}" if calls else "",
                f'op_name="{meta.group(1)}"' if meta else "",
            ] if x)
            print(f"{ms / cnt:9.3f}  {cnt:5d}  {name}\n"
                  f"{'':>17}{extra or brief}")


if __name__ == "__main__":
    main()
