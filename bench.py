"""Benchmark: full fine_tune training-step throughput on real hardware.

Measures examples/sec of the complete Dynamo-Depth train step (all 7
networks forward+backward, view synthesis at every scale, full loss stack
incl. RANSAC ground plane, Adam update) at the KITTI training resolution
192x640 with the LiteMono backbone — the reference's headline training
configuration (README.md:59-66).

Baseline: the reference publishes no throughput numbers (SURVEY §6). The
``vs_baseline`` ratio uses a measured-on-paper estimate of the 4x RTX 2080 Ti
reference node at ~20 examples/s total (batch 3/GPU, per the README hardware
note); the north-star target is >4x that on a v5e-8 (BASELINE.md).

By default measures the measured per-example sweet spot (7 since round 5:
174.2 ms/step with the f32 warp operand the corrected ``--image_dtype auto``
knee now selects, BENCH.md) first, then batch 8 and the recipe batch (3),
and emits the best honest number; pass ``--batch_size N`` to measure a
single configuration. Each leg runs in a
subprocess bounded by the remaining wall-clock budget (DYNAMO_BENCH_BUDGET,
default 540 s — under the driver's 600 s timeout); legs that don't fit are
skipped with a message.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — always,
even on SIGTERM, from the best *completed* leg.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compile cache — must be config.update, not env (the axon
# sitecustomize imports jax's config at interpreter startup; see
# dynamo_depth_tpu/__init__.py).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REFERENCE_NODE_EXAMPLES_PER_SEC = 20.0  # 4x2080Ti estimate, see module docstring


def wait_for_backend(window_s: float = 480.0, probe_timeout_s: float = 60.0) -> str:
    """Bounded probe for a usable jax backend.

    The axon TPU tunnel can wedge such that ``jax.devices()`` hangs forever in
    every new process (CLAUDE.md, observed 2026-08-17) — exactly what killed
    BENCH_r02.json (rc=1, died instantly on a wedged tunnel with no retry).
    Probe in a subprocess with a hard timeout, retry with backoff for a
    bounded window, and return the platform string on success.
    Raises RuntimeError with a diagnosis when the window is exhausted.
    """
    deadline = time.monotonic() + window_s
    delay, attempt, last = 10.0, 0, "no probe ran"
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform, len(d))"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0 and r.stdout.strip():
                platform, n = r.stdout.split()
                print(f"[bench] backend probe ok (attempt {attempt}): "
                      f"{platform} x{n}", file=sys.stderr)
                return platform
            last = f"rc={r.returncode}: {(r.stderr or r.stdout).strip()[-300:]}"
        except subprocess.TimeoutExpired:
            last = (f"probe hung >{probe_timeout_s:.0f}s "
                    "(axon tunnel wedge signature, CLAUDE.md)")
        remaining = deadline - time.monotonic()
        print(f"[bench] backend probe attempt {attempt} failed ({last}); "
              f"{remaining:.0f}s left in window", file=sys.stderr)
        if remaining < delay:
            raise RuntimeError(
                f"no usable jax backend after {attempt} probes over "
                f"{window_s:.0f}s; last failure: {last}")
        time.sleep(delay)
        delay = min(delay * 2, 120.0)


def measure(args, batch_size):
    """Time the fine_tune step at one batch size; returns a result dict."""
    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.training.trainer import Trainer, partition_params
    from __graft_entry__ import _synthetic_batch

    cfg = DynamoConfig(
        dataset="kitti", depth_model=args.depth_model, batch_size=batch_size,
        compute_dtype=args.compute_dtype, image_dtype=args.image_dtype,
        height=args.height, width=args.width,
        no_train_vis=True, num_devices=0,
    )
    trainer = Trainer(cfg)
    built = trainer._build_phase("fine_tune", steps_per_epoch=8000)
    t_params, f_params = partition_params(
        trainer.variables["params"], built["trainable_modules"]
    )
    batch_stats = trainer.variables.get("batch_stats", {})
    opt_state = built["tx"].init(t_params)
    batch = trainer.put_batch(
        _synthetic_batch(cfg, trainer.global_B, cfg.height, cfg.width)
    )

    def step(i, t_params, batch_stats, opt_state):
        return built["step_fn"](
            t_params, f_params, batch_stats, opt_state, batch,
            jax.random.PRNGKey(i), jnp.int32(i),
        )

    # compile + warmup. NOTE (axon tunnel): jax.block_until_ready returns at
    # remote *enqueue*, not completion, and a host readback pays a ~37 ms
    # HTTP roundtrip (measured: scalar roundtrip 37.2 ms, see BENCH.md). So
    # timing uses a two-run DIFFERENCE — (N2 - N1 steps) between two synced
    # readbacks — which cancels both the roundtrip latency and any
    # enqueue-side pipelining bias.
    t_params, batch_stats, opt_state, losses = step(0, t_params, batch_stats, opt_state)
    float(losses["loss"])
    for i in range(1, 4):
        t_params, batch_stats, opt_state, losses = step(i, t_params, batch_stats, opt_state)
    float(losses["loss"])

    def run_block(i0, n):
        nonlocal t_params, batch_stats, opt_state
        t0 = time.perf_counter()
        for i in range(i0, i0 + n):
            t_params, batch_stats, opt_state, losses = step(
                i, t_params, batch_stats, opt_state
            )
        float(losses["loss"])  # forced device->host readback
        return time.perf_counter() - t0

    n1, n2 = 5, 55
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t_small = run_block(4, n1)
    t_large = run_block(4 + n1, n2)
    if args.profile_dir:
        jax.profiler.stop_trace()
    n_steps = n2 - n1
    dt = t_large - t_small

    # --- MFU accounting (stderr; the stdout contract stays one JSON line).
    # cost_analysis flops are the XLA-estimated fp32-equivalent flops of the
    # whole compiled step (fwd+bwd+optimizer).
    try:
        compiled = built["step_fn"].lower(
            t_params, f_params, batch_stats, opt_state, batch,
            jax.random.PRNGKey(0), jnp.int32(0),
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0))
        # v5e (v5 lite) peak: 197 TFLOP/s bf16, ~1/2 that for fp32 ops
        peak = 197e12 if args.compute_dtype == "bfloat16" else 98.5e12
        n_chips = trainer.n_dev
        mfu = step_flops / (dt / n_steps) / (peak * n_chips)
        print(
            f"[bench] b{batch_size}: step={dt / n_steps * 1e3:.1f} ms  "
            f"flops/step={step_flops:.3e}  "
            f"HW peak={peak:.0e}/chip x{n_chips}  MFU={mfu * 100:.1f}%  "
            f"bytes/step={float(ca.get('bytes accessed', 0.0)):.3e}",
            file=sys.stderr,
        )
    except Exception as e:  # cost_analysis availability varies by backend
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    examples_per_sec = trainer.global_B * n_steps / dt
    print(
        f"[bench] b{batch_size}: {examples_per_sec:.2f} examples/s "
        f"({dt / n_steps * 1e3:.1f} ms/step, global_B={trainer.global_B})",
        file=sys.stderr,
    )
    return {
        "batch_size": batch_size,
        "examples_per_sec": examples_per_sec,
        "ms_per_step": dt / n_steps * 1e3,
    }


# Minimum wall-clock worth starting a leg with. A warm leg is ~60-90 s
# (trainer init + cached-executable load + 64 timed steps); a cold compile
# is minutes and must be bounded, not trusted.
MIN_LEG_S = 60.0

_emitted = False


def emit_contract(args, results, error=None):
    """Print the ONE stdout JSON contract line — exactly once.

    Called from the normal exit path, the finally block, and the SIGTERM
    handler, so a driver timeout (rc=124) can no longer leave parsed=null
    when at least one leg finished (round-4 VERDICT item 1: BENCH_r04.json
    died between the b3 and b8 legs with no contract line)."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    if results:
        best = max(results, key=lambda r: r["examples_per_sec"])
        line = {
            "metric": (f"kitti_litemono_fine_tune_train_throughput_"
                       f"{args.compute_dtype}_b{best['batch_size']}"),
            "value": round(best["examples_per_sec"], 2),
            "unit": "examples/s",
            "vs_baseline": round(
                best["examples_per_sec"] / REFERENCE_NODE_EXAMPLES_PER_SEC, 3),
        }
    else:
        line = {
            "metric": (f"kitti_litemono_fine_tune_train_throughput_"
                       f"{args.compute_dtype}"),
            "value": None, "unit": "examples/s", "vs_baseline": None,
            "error": error or "no measurement leg completed",
        }
    print(json.dumps(line))
    sys.stdout.flush()


def run_leg(args, batch_size, timeout_s):
    """Run one measurement leg in a subprocess bounded by ``timeout_s``.

    Same budget discipline as the dryrun flagship arm
    (__graft_entry__.py::dryrun_multichip): a timeout is a SKIP (returns
    None after an explicit message), a crash is a loud skip, a completed
    leg hands back its result dict via a temp file. Progress streams
    through inherited stdio."""
    fd, out_path = tempfile.mkstemp(suffix=".json", prefix="bench_leg_")
    os.close(fd)
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--batch_size", str(batch_size), "--leg_out", out_path,
        "--compute_dtype", args.compute_dtype,
        "--image_dtype", args.image_dtype,
        "--depth_model", args.depth_model,
    ]
    if args.height:
        cmd += ["--height", str(args.height)]
    if args.width:
        cmd += ["--width", str(args.width)]
    if args.profile_dir:
        cmd += ["--profile_dir", args.profile_dir]
    try:
        proc = subprocess.run(cmd, timeout=timeout_s, env=os.environ.copy())
        if proc.returncode != 0:
            print(f"[bench] b{batch_size} leg FAILED (rc={proc.returncode}) "
                  "- continuing to remaining legs", file=sys.stderr)
            return None
        with open(out_path) as f:
            return json.load(f)
    except subprocess.TimeoutExpired:
        print(f"[bench] b{batch_size} leg skipped: exceeded its "
              f"{timeout_s:.0f}s budget slice (cold compile? warm "
              f"/tmp/jax_cache with `python bench.py --batch_size "
              f"{batch_size}`)", file=sys.stderr)
        return None
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def main():
    import argparse

    t0 = time.monotonic()
    ap = argparse.ArgumentParser()
    ap.add_argument("--compute_dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--image_dtype", default="auto",
                    choices=["auto", "float32", "bfloat16"],
                    help="warp-gather operand storage dtype (losses.py); "
                         "auto = bf16 for per-device operands >= 2**19 px")
    ap.add_argument("--batch_size", type=int, default=None,
                    help="single batch size to measure; default measures the "
                         "headline sweet spot (7), then 8, then the recipe "
                         "batch (3), reporting the best completed leg")
    ap.add_argument("--depth_model", default="litemono")
    ap.add_argument("--height", type=int, default=None,
                    help="override the dataset training height (default 192)")
    ap.add_argument("--width", type=int, default=None,
                    help="override the dataset training width (default 640)")
    ap.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler trace of the timed steps")
    ap.add_argument("--probe_window", type=float,
                    default=float(os.environ.get("DYNAMO_BENCH_PROBE_WINDOW", "240")))
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("DYNAMO_BENCH_BUDGET", "540")),
                    help="total wall-clock budget (s), sized under the "
                         "driver's 600 s timeout; legs that don't fit are "
                         "skipped and the best completed leg is reported")
    ap.add_argument("--leg_out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.leg_out:
        # Child mode: one in-process measurement, result to the temp file.
        # The parent already probed the backend and bounds us with a timeout.
        result = measure(args, args.batch_size)
        with open(args.leg_out, "w") as f:
            json.dump(result, f)
        return

    results = []

    def on_term(signum, frame):
        # GNU timeout SIGTERMs our process group: emit the contract line
        # from whatever completed before dying, so the driver's parsed
        # field survives an rc=124.
        print(f"[bench] caught signal {signum}; emitting best completed leg",
              file=sys.stderr)
        emit_contract(args, results, error=f"killed by signal {signum}")
        os._exit(1 if not results else 0)

    signal.signal(signal.SIGTERM, on_term)

    try:
        # Cap the probe window so a flaky-tunnel retry loop cannot eat the
        # whole leg budget.
        wait_for_backend(window_s=min(args.probe_window, args.budget - 2 * MIN_LEG_S))
    except RuntimeError as e:
        emit_contract(args, [], error=str(e))
        sys.exit(1)

    # Headline (b7, the BENCH.md sweet spot) FIRST so a budget kill during
    # a later leg still records the number that matters. Each leg's slice
    # reserves LEG_RESERVE_S per *remaining* leg, so one cold compile
    # cannot starve every later leg (a cold 192x640 b8 server-side compile
    # measures > 9 min — more than the whole driver window).
    LEG_RESERVE_S = 150.0
    batches = [args.batch_size] if args.batch_size else [7, 8, 3]
    try:
        for i, b in enumerate(batches):
            remaining = args.budget - (time.monotonic() - t0)
            if remaining < MIN_LEG_S:
                print(f"[bench] b{b} leg skipped: only {remaining:.0f}s of the "
                      f"{args.budget:.0f}s budget left", file=sys.stderr)
                continue
            legs_after = len(batches) - i - 1
            slice_s = max(MIN_LEG_S, remaining - LEG_RESERVE_S * legs_after)
            r = run_leg(args, b, timeout_s=slice_s)
            if r is not None:
                results.append(r)
    finally:
        emit_contract(args, results)
    if not results:
        sys.exit(1)


if __name__ == "__main__":
    main()
