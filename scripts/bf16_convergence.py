"""fp32-vs-bf16 convergence comparison (round-1 VERDICT item 10).

Trains the full curriculum twice — ``--compute_dtype float32`` and
``bfloat16`` — on a *geometrically consistent* synthetic KITTI scene and
compares the val depth metrics (abs_rel / rmse / a1, median-scaled like the
reference's ``DepthMetrics``), not just loss traces.

The scene is exactly renderable from any camera position (no warping
artifacts): a ground plane at camera height 1.5 m plus a frontal wall,
textured by a fixed random-Fourier-feature function of the *world* surface
coordinates, viewed by a camera translating forward ``DZ`` per frame. Every
frame and its ground-truth depth are analytically consistent, so a correctly
converging photometric pipeline drives abs_rel toward 0 (up to the usual
monocular scale, which median scaling removes).

Usage (TPU or DYNAMO_FORCE_PLATFORM=cpu):
    python scripts/bf16_convergence.py --out /tmp/bf16_conv \
        [--height 96 --width 320 --steps-per-epoch 600 --epochs 2 2 2 2]
"""

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

CAM_HEIGHT = 1.5   # m, ground plane distance below the optical axis
WALL_MARGIN = 20.0  # m kept between the last camera position and the wall
DZ = 0.25          # m forward per frame
N_FRAMES = 30
HORIZON = 0.553    # v/H above which the wall is used (ground depth > ~55 m)
FX_N, FY_N = 0.58, 1.92  # the KITTI loader's normalized intrinsics
DEPTH_KEYS = ("de:abs_rel", "de:sq_rel", "de:rms", "da:a1", "da:a2", "da:a3")


def _texture(rng, a, b, octaves=2, fa=None, fb=None):
    """Deterministic RGB texture over world surface coords (a, b).

    ABSOLUTE brightness (no per-frame min/max normalization — the round-2
    version normalized over each frame's visible range, which made surface
    brightness flicker between frames, a real photometric inconsistency
    the loss then had to explain). Multi-octave random-Fourier features
    give the gradient structure photometric depth learning needs.

    ``fa``/``fb``: optional per-pixel texture-coordinate footprints (units
    per pixel) for ANALYTIC anti-aliasing. The ground plane's foreshortening
    pushes the texture ~10 cycles/pixel past Nyquist near the horizon, and
    the alias pattern depends on camera position — frame-INconsistent noise
    that the first round-3 run's loss exploited (val loss fell while abs_rel
    diverged 0.35 -> 3.2). Because the texture is a finite cosine sum, the
    pixel box filter is exact per component: attenuate each cosine by a
    Gaussian in its projected per-pixel frequency, which converges the far
    field to the texture's true local mean.
    """
    K = 24
    f = rng.uniform(-3.0, 3.0, (2, K))
    ph = rng.uniform(0, 2 * np.pi, (3, K))
    amp = rng.uniform(0.3, 1.0, (3, K)) / np.sqrt(K)
    out, norm = 0.0, 0.0
    for o in range(octaves):
        arg = (a[..., None] * f[0] + b[..., None] * f[1]) * (2 ** o)
        if fa is not None:
            nu = (np.abs(f[0]) * fa[..., None]
                  + np.abs(f[1]) * fb[..., None]) * (2 ** o)  # cycles/pixel
            gain = np.exp(-0.5 * (np.pi * nu) ** 2)
        else:
            gain = 1.0
        chans = [np.sum(amp[c] * gain * np.cos(2 * np.pi * arg + ph[c]), -1)
                 for c in range(3)]
        out = out + np.stack(chans, -1) * (0.6 ** o)
        norm += 0.6 ** o
    return np.clip(0.5 + 0.55 * out / norm, 0.0, 1.0)


CORRIDOR_HALF_W = 7.0  # m, side-wall distance from the camera axis


def render_scene(root, W0=640, H0=192, dz=DZ, n_frames=N_FRAMES,
                 corridor=True, gt_stride=3, ss=2):
    """Write a consistent n_frames-frame KITTI-layout sequence + splits.

    Geometry: textured ground plane + frontal wall, and (``corridor=True``)
    two side walls at x = ±CORRIDOR_HALF_W — the side walls put large-
    parallax structure in the image periphery, which the round-2 two-plane
    scene lacked (its depth collapsed to near-constant during disp_init;
    BENCH.md round-3 study). Every surface's depth and texture are exact
    functions of world coordinates, so all frames are mutually consistent.

    ``ss``: supersampling factor. Rendering at native resolution aliases the
    ground texture near the horizon (foreshortening pushes it far past
    Nyquist), and the alias pattern depends on camera position — REAL
    photometric inconsistency between frames. The first round-3 TPU run
    showed the loss exploiting it: val loss fell 0.28 -> 0.21 while abs_rel
    diverged 0.35 -> 3.2 (the far field dominates the image area). Render at
    ss x resolution and box-filter down so the far field converges to the
    texture's true local mean instead.
    """
    from PIL import Image

    seq = "2011_09_26/2011_09_26_drive_0001_sync"
    cam = "image_02"
    base = osp.join(root, seq, cam)
    os.makedirs(osp.join(base, "rgb", "downsample"), exist_ok=True)
    os.makedirs(osp.join(base, "depth"), exist_ok=True)

    # Scene stamp: the render is deterministic in these params, so a second
    # arm (one process per dtype, CLAUDE.md) reuses the frames instead of
    # paying the ~15 min re-render on this 1-CPU box. "aa3" = the analytic
    # anti-aliased texture revision; bump when the scene function changes.
    stamp = dict(W0=W0, H0=H0, dz=dz, n_frames=n_frames, corridor=corridor,
                 gt_stride=gt_stride, ss=ss, version="aa3")
    stamp_path = osp.join(root, "scene_stamp.json")
    if osp.exists(stamp_path):
        with open(stamp_path) as f:
            if json.load(f) == stamp:
                print("scene stamp matches - reusing rendered frames", flush=True)
                return osp.join(root, "splits")

    # The wall must stay ahead of the WHOLE trajectory: round 3's first run
    # used a fixed 22 m wall with dz=0.75 x 48 frames = 36 m of travel — the
    # camera drove THROUGH the wall at frame ~29, clamping it to a degenerate
    # 1 m plane that made every later frame identical (val loss ~1e-4,
    # meaningless metrics). Place it past the final camera position.
    wall_z = n_frames * dz + WALL_MARGIN

    rng_seed = dict(ground=1, front=2, left=3, right=4)
    eps = 1e-6

    def rays(W, H):
        u = (np.arange(W) + 0.5) / W  # normalized pixel centers
        v = (np.arange(H) + 0.5) / H
        uu, vv = np.meshgrid(u, v)
        return (uu - 0.5) / FX_N, (vv - 0.5) / FY_N  # (x/z, y/z)

    def surfaces(rx, ry, cam_z):
        """Candidate camera-frame depth per surface (inf where ray misses)."""
        INF = np.full_like(rx, np.inf)
        surf = {
            "ground": np.where(ry > eps, CAM_HEIGHT / np.maximum(ry, eps), INF),
            "front": np.full_like(rx, np.maximum(wall_z - cam_z, 1.0)),
        }
        if corridor:
            surf["left"] = np.where(rx < -eps, CORRIDOR_HALF_W / np.maximum(-rx, eps), INF)
            surf["right"] = np.where(rx > eps, CORRIDOR_HALF_W / np.maximum(rx, eps), INF)
        return surf

    rx_hi, ry_hi = rays(W0 * ss, H0 * ss)  # image rendering (AA, see above)
    rx_lo, ry_lo = rays(W0, H0)            # gt depth at native pixel centers

    for i in range(n_frames):
        cam_z = i * dz
        surf = surfaces(rx_hi, ry_hi, cam_z)
        names = list(surf)
        pick = np.argmin(np.stack([surf[n] for n in names]), axis=0)
        # Texture each surface by its own world-coordinate chart.
        img = np.zeros((H0 * ss, W0 * ss, 3), np.float32)
        for k, name in enumerate(names):
            zs = surf[name]
            if name == "ground":
                ta, tb = rx_hi * zs, zs + cam_z         # (world x, world z)
            elif name == "front":
                ta, tb = rx_hi * zs, ry_hi * zs         # (world x, y)
            else:
                ta, tb = zs + cam_z, ry_hi * zs         # (world z, y)
            finite = np.isfinite(zs)
            ta = np.where(finite, ta, 0.0).astype(np.float32) * 0.35
            tb = np.where(finite, tb, 0.0).astype(np.float32) * 0.35
            # Per-pixel texture footprint (units/pixel) for analytic AA.
            fa = np.hypot(*np.gradient(ta))
            fb = np.hypot(*np.gradient(tb))
            tex = _texture(np.random.RandomState(rng_seed[name]),
                           ta, tb, fa=fa, fb=fb)
            img = np.where((pick == k)[..., None], tex, img)
        img = img.reshape(H0, ss, W0, ss, 3).mean(axis=(1, 3))  # box AA
        Image.fromarray((img * 255).astype(np.uint8)).save(
            osp.join(base, "rgb", "downsample", f"{i:010}.jpg"), quality=95
        )
        # Sparse gt on a grid, capped at the eval range.
        z = np.min(np.stack(list(surfaces(rx_lo, ry_lo, cam_z).values())), axis=0)
        hh, ww = np.meshgrid(np.arange(0, H0, gt_stride),
                             np.arange(0, W0, gt_stride), indexing="ij")
        zz = z[hh, ww]
        keep = zz < 60.0
        pts = np.stack([hh[keep], ww[keep], zz[keep]], -1).astype(np.float32)
        np.save(osp.join(base, "depth", f"{i:010}.npy"), pts)

    with open(osp.join(root, seq, "calib_cam_to_cam.txt"), "w") as f:
        f.write(f"S_rect_02: {W0:.6e} {H0:.6e}\nS_rect_03: {W0:.6e} {H0:.6e}\n")

    splits = osp.join(root, "splits", "synth")
    os.makedirs(splits, exist_ok=True)
    n_val = max(n_frames // 4, 4)
    train_hi = n_frames - n_val - 2
    with open(osp.join(splits, "train_files.txt"), "w") as f:
        f.write("".join(f"{seq} {i} l\n" for i in range(1, train_hi)))
    with open(osp.join(splits, "val_files.txt"), "w") as f:
        f.write("".join(f"{seq} {i} l\n" for i in range(train_hi + 1, n_frames - 1)))
    with open(stamp_path, "w") as f:
        json.dump(stamp, f)
    return osp.join(root, "splits")


PHASE_ORDER = ("disp_init", "motion_init", "mask_init", "fine_tune")


def _find_resume(model_dir, epochs):
    """Latest saved (phase, epoch) under ``model_dir`` -> (ckpt_path,
    remaining-epochs list, completed optimizer steps). The wedge-prone axon
    tunnel (CLAUDE.md) can kill an arm mid-curriculum; per-epoch checkpoints
    make the arm restartable. Note the resumed phase's StepLR restarts from
    its base LR (the reference's per-phase restart behaves the same way)."""
    best = None
    for d in os.listdir(model_dir) if osp.isdir(model_dir) else []:
        for pi, ph in enumerate(PHASE_ORDER):
            if d.startswith(ph + "_"):
                try:
                    ep = int(d.rsplit("_", 1)[1])
                except ValueError:
                    continue
                if best is None or (pi, ep) > best[:2]:
                    best = (pi, ep, osp.join(model_dir, d))
    if best is None:
        return None, list(epochs), 0
    pi, ep, path = best
    remaining = list(epochs)
    for i in range(pi):
        remaining[i] = 0
    remaining[pi] = max(epochs[pi] - (ep + 1), 0)
    done = sum(epochs[i] for i in range(pi)) + ep + 1
    return path, remaining, done


def run_one(compute_dtype, data_root, splits_dir, args):
    from dynamo_depth_tpu.config import DynamoConfig
    from dynamo_depth_tpu.training.trainer import Trainer

    os.environ["DYNAMO_SPLITS_DIR"] = splits_dir
    model_dir = osp.join(args.out, "logs", f"conv_{compute_dtype}", "models")
    load_ckpt, epochs, done_epochs = _find_resume(model_dir, args.epochs)
    base_step = done_epochs * args.steps_per_epoch
    if load_ckpt:
        print(f"resuming {compute_dtype} from {load_ckpt} "
              f"(remaining epochs {epochs})", flush=True)
    cfg = DynamoConfig(
        dataset="kitti", split="synth", data_path=data_root + "/",
        depth_model=args.depth_model, height=args.height, width=args.width,
        batch_size=args.batch_size, compute_dtype=compute_dtype,
        learning_rate=args.lr, load_ckpt=load_ckpt or "",
        # epoch_size counts optimizer STEPS per epoch (the loader draws
        # global_batch * epoch_size filenames, data/loader.py:28-33).
        epoch_size=args.steps_per_epoch,
        epoch_schedules=epochs, log_frequency=args.val_every,
        no_train_vis=True, num_devices=0, num_workers=2, seed=args.seed,
        log_dir=osp.join(args.out, "logs"),
        model_name=f"conv_{compute_dtype}"
        + (f"_seed{args.seed}" if args.seed else ""),
    )

    class RecordingTrainer(Trainer):
        def __init__(self, cfg):
            super().__init__(cfg)
            self.history = []
            self._wandb = None

        def _device_prefetch(self, loader):
            # The axon client leaks host RSS equal to every host->device
            # transfer (CLAUDE.md), which OOMs multi-thousand-step runs. For
            # this experiment, transfer only the first N distinct batches per
            # epoch and cycle them on-device: the leak becomes O(N), and both
            # dtype arms see literally identical batch streams — a cleaner
            # matched comparison. N=0 restores the production prefetch path.
            # The loader is abandoned once the cache is full (its finally
            # clause stops the workers) so the host stops paying the decode
            # cost — it was the measured bottleneck on this 1-CPU box.
            if args.device_batch_cache <= 0:
                yield from super()._device_prefetch(loader)
                return
            n_steps = len(loader)
            cache = []
            for batch in loader:
                cache.append(self.put_batch(self._train_keys_only(batch)))
                if len(cache) >= min(args.device_batch_cache, n_steps):
                    break
            for i in range(n_steps):
                yield cache[i % len(cache)]

        def setup_logging(self):
            self._wandb = None

        def log_scalars(self, mode, losses):
            if mode == "val":
                rec = {k: float(v) for k, v in losses.items()
                       if np.ndim(v) == 0}
                rec["g_step"] = int(self.g_step) + base_step
                self.history.append(rec)
                keys = [k for k in ("de:abs_rel", "de:rms", "da:a1", "loss") if k in rec]
                print(f"  [val {compute_dtype} step {self.g_step}] "
                      + "  ".join(f"{k}={rec[k]:.4f}" for k in keys), flush=True)

        def log_vis(self, *a, **k):
            pass

    trainer = RecordingTrainer(cfg)
    trainer.train()
    return trainer.history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bf16_conv")
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--depth_model", default="litemono")
    ap.add_argument("--batch_size", type=int, default=6)
    ap.add_argument("--steps-per-epoch", type=int, default=100)
    ap.add_argument("--epochs", type=int, nargs=4, default=[2, 1, 1, 2],
                    help="epochs per curriculum phase")
    ap.add_argument("--val_every", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="learning rate (identical across dtype arms; raise "
                         "to make depth move within a short synthetic budget)")
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=0,
                    help="model-init/augmentation seed (basin-sensitivity "
                         "controls, BENCH.md round-4 TPU-arm study)")
    ap.add_argument("--device_batch_cache", type=int, default=0,
                    help="transfer only this many distinct batches per epoch "
                         "and cycle them on-device (bounds the axon host-RAM "
                         "transfer leak; 0 = production prefetch)")
    ap.add_argument("--dz", type=float, default=0.75,
                    help="camera forward motion per frame, m (parallax "
                         "baseline; the round-2 0.25 m gave too little "
                         "signal for depth to move)")
    ap.add_argument("--n_frames", type=int, default=48)
    ap.add_argument("--render_wh", type=int, nargs=2, default=[640, 192],
                    help="rendered frame size (W H). Default IS the training "
                         "resolution (640x192): the texture AA is analytic, so "
                         "rendering at train res is already alias-free. Raise "
                         "it (e.g. KITTI-raw-like 1242x375) only to exercise "
                         "the dataset's downscale path, at ~4x the render cost")
    ap.add_argument("--flat", action="store_true",
                    help="round-2 two-plane scene (no corridor side walls)")
    args = ap.parse_args()

    data_root = osp.join(args.out, "data")
    splits_dir = render_scene(data_root, W0=args.render_wh[0],
                              H0=args.render_wh[1], dz=args.dz,
                              n_frames=args.n_frames, corridor=not args.flat)
    print(f"scene rendered under {data_root}", flush=True)

    results = {}
    for dt in args.dtypes:
        print(f"==== training compute_dtype={dt} ====", flush=True)
        results[dt] = run_one(dt, data_root, splits_dir, args)
        # Per-dtype dump: the axon host-RAM leak forces one-process-per-arm
        # runs (CLAUDE.md), which must not overwrite each other's history.
        # On resume, keep the prior process's records up to where this one
        # started (g_step carries the resume offset).
        dump_path = osp.join(args.out, f"history_{dt}.json")
        if osp.exists(dump_path) and results[dt]:
            with open(dump_path) as f:
                prev = json.load(f)
            first = results[dt][0]["g_step"]
            results[dt] = [r for r in prev if r["g_step"] < first] + results[dt]
        with open(dump_path, "w") as f:
            json.dump(results[dt], f, indent=1)

    with open(osp.join(args.out, "history.json"), "w") as f:
        json.dump(results, f, indent=1)

    print("\n==== final val metrics (last record per dtype) ====")
    for dt, hist in results.items():
        if hist:
            last = hist[-1]
            keys = [k for k in DEPTH_KEYS if k in last]
            print(f"{dt:10s} step {last['g_step']:5d}  "
                  + "  ".join(f"{k}={last[k]:.4f}" for k in keys))


if __name__ == "__main__":
    main()
