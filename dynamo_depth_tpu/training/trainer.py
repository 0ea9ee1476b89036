"""Curriculum trainer (reference ``Trainer.py:19-756``), TPU-native.

Structure parity:
- four phases [disp_init, motion_init, mask_init, fine_tune] with per-phase
  trainable-network subsets, fresh Adam, StepLR(step=10, gamma=0.5), and
  fine_tune at 0.5x lr (Trainer.py:466-497);
- epoch resampling of the training file list (8000 steps, Trainer.py:519-522);
- automasking only during disp_init (Trainer.py:117);
- identical loss assembly (see training/losses.py), console log line, and
  per-phase module-keyed checkpoints.

TPU-native re-design:
- one **jitted, shard_map-ped train step per phase**: batch sharded over the
  1-D ``data`` mesh, params/optimizer replicated, gradients ``pmean``-ed over
  ICI — exact DDP semantics (per-device BatchNorm batch statistics included)
  with dead phase branches traced out (replacing find_unused_parameters);
- frozen networks are *partitioned out* of the differentiated arguments, so
  XLA eliminates their backward pass entirely (the reference computes and
  discards those gradients);
- the color pyramid resize happens on device inside the step
  (Trainer.py:722-734 does it on host per batch);
- the RANSAC ground plane and automask tie-break noise use jax PRNG folded
  per (step, device).
"""

from __future__ import annotations

import os.path as osp
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import unfreeze
from jax.sharding import PartitionSpec as P
from jax import shard_map

from dynamo_depth_tpu.config import DynamoConfig
from dynamo_depth_tpu.data import DATASETS
from dynamo_depth_tpu.data.loader import BatchLoader, make_dataset, sample_epoch_filenames
from dynamo_depth_tpu.data.splits import read_split, split_exists
from dynamo_depth_tpu.models.model import DynamoModel, modules_for_networks
from dynamo_depth_tpu.ops.metrics import depth_metrics
from dynamo_depth_tpu.ops.warp import resize_bicubic_aa
from dynamo_depth_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    is_main_process,
    make_mesh,
    replicate_to_mesh,
)
from dynamo_depth_tpu.training import checkpoint as ckpt
from dynamo_depth_tpu.training.losses import compute_losses, view_synthesis
from dynamo_depth_tpu.utils.io import join_dir, sec_to_hm_str

PHASES = ("disp_init", "motion_init", "mask_init", "fine_tune")

# Phase -> (bool_CmpFlow, bool_MotMask, trainable networks, lr factor)
# (Trainer.py:466-490).
PHASE_SPEC = {
    "disp_init": (False, False, ("Depth", "Pose"), 1.0),
    "motion_init": (True, False, ("CmpFlow",), 1.0),
    "mask_init": (True, True, ("Pose", "CmpFlow", "MotMask"), 1.0),
    "fine_tune": (True, True, ("Depth", "Pose", "CmpFlow", "MotMask"), 0.5),
}


def partition_params(params: Dict, trainable_modules) -> Tuple[Dict, Dict]:
    train = {k: v for k, v in params.items() if k in trainable_modules}
    frozen = {k: v for k, v in params.items() if k not in trainable_modules}
    return train, frozen


def merge_params(train: Dict, frozen: Dict) -> Dict:
    out = dict(frozen)
    out.update(train)
    return out



def _outputs_to_f32(outputs):
    """bf16 network outputs -> fp32 before view synthesis: sample coordinates
    and losses must not inherit bf16's ~2^-8 relative quantization."""
    return {
        k: (v.astype(jnp.float32) if hasattr(v, "dtype") and v.dtype == jnp.bfloat16 else v)
        for k, v in outputs.items()
    }


class Trainer:
    """Holds model variables + per-phase compiled steps; used by train.py and
    (as a model-serving container) by every eval CLI, mirroring the
    reference's Trainer-centric design (SURVEY §1)."""

    def __init__(self, cfg: DynamoConfig, init_data: bool = True):
        cfg.validate()
        self.cfg = cfg
        self.mesh = make_mesh(cfg.num_devices)
        self.n_dev = self.mesh.devices.size
        self.B = cfg.batch_size  # per-device batch (reference: per-GPU)
        self.global_B = self.B * self.n_dev
        self.H, self.W = cfg.height, cfg.width
        self.num_scales = len(cfg.scales)
        self.log_path = osp.join(cfg.log_dir, cfg.model_name)

        self.print("\n=============== Trainer Initialization ===============")
        self.print(f"mesh: {self.n_dev} device(s) | per-device batch {self.B} "
                   f"| global batch {self.global_B}")

        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = DynamoModel(
            depth_model=cfg.depth_model,
            encoder_num_layers=cfg.encoder_num_layers,
            scales=tuple(cfg.scales),
            frame_ids=tuple(cfg.frame_ids),
            dtype=self.dtype,
        )

        self.rng = jax.random.PRNGKey(cfg.seed)
        self.variables = self._init_variables()
        if cfg.load_ckpt:
            self.load_model()
        elif cfg.weights_init == "pretrained":
            # imagenet backbone init (resnet_encoder.py:46-49, model.py:25);
            # silently keeps random init when the zoo files are absent.
            try:
                from dynamo_depth_tpu.models.convert import load_pretrained_backbones

                self.variables = load_pretrained_backbones(
                    self.variables, cfg, verbose=is_main_process(), seed=cfg.seed,
                )
            except ImportError:
                if jax.process_count() > 1:
                    # One host silently keeping random init while others load
                    # pretrained weights would diverge the "replicated" params
                    # (also caught by replicate_to_mesh's fingerprint check,
                    # but fail here with the actionable cause).
                    raise RuntimeError(
                        "imagenet-pretrained load failed (torch unavailable) "
                        "in multi-process mode — heterogeneous init would "
                        "silently diverge hosts; install torch on every host "
                        "or pass --weights_init scratch"
                    )
                self.print("|- torch unavailable - encoders keep random init")
        self.variables = replicate_to_mesh(self.variables, self.mesh)

        self.dataset_cls = DATASETS[cfg.dataset]
        self.g_step = 0
        self._step_cache: Dict = {}
        self._predict_cache: Dict = {}
        self.print("=============== Trainer Initialization ===============\n")

    # ------------------------------------------------------------------ init

    def _init_variables(self):
        self.rng, k = jax.random.split(self.rng)
        dummy = {
            ("color_aug", f, 0): jnp.zeros((1, self.H, self.W, 3), jnp.float32)
            for f in self.cfg.frame_ids
        }
        variables = self.model.init({"params": k, "droppath": k}, dummy, train=False)
        return unfreeze(variables) if hasattr(variables, "unfreeze") else dict(variables)

    # -------------------------------------------------------------- data side

    def process_inputs_device(self, inputs: Dict) -> Dict:
        """Device-side pyramid: ('color', 0, s) via recursive bicubic halving
        with clamping (Trainer.py:729-734). Runs inside jit."""
        out = dict(inputs)
        for scale in self.cfg.scales:
            if scale == 0:
                continue
            prev = out[("color", 0, scale - 1)]
            h, w = self.H // (2 ** scale), self.W // (2 ** scale)
            out[("color", 0, scale)] = resize_bicubic_aa(prev, (h, w))
        return out

    def get_dataset(self, filenames, is_train=False, load_depth=False, load_mask=False,
                    img_type=None):
        return make_dataset(
            self.cfg, filenames, is_train=is_train, load_depth=load_depth,
            load_mask=load_mask, img_type=img_type, dataset_cls=self.dataset_cls,
        )

    def _make_train_loader(self, epoch_seed: int) -> BatchLoader:
        filenames = read_split(self.cfg.split, "train")
        filenames = sample_epoch_filenames(
            filenames, self.cfg.epoch_size, self.global_B, seed=epoch_seed
        )
        ds = self.get_dataset(filenames, is_train=True)
        # Each host loads only its local shard (B x local devices); the global
        # batch for step t is the concatenation of hosts' strided local
        # batches — every host sees the same number of equal batches, items
        # are disjoint (DistributedSampler semantics, Trainer.py:527).
        local_B = self.global_B // jax.process_count()
        return BatchLoader(
            ds, local_B, shuffle=self.cfg.epoch_size <= 0, drop_last=True,
            num_workers=self.cfg.num_workers, seed=self.cfg.seed,
            shard=(jax.process_index(), jax.process_count()),
            prefetch=self.cfg.prefetch_depth,
        )

    def _make_val_loader(self) -> BatchLoader:
        which = "val" if split_exists(self.cfg.split, "val") else "train"
        filenames = read_split(self.cfg.split, which)
        ds = self.get_dataset(filenames, is_train=False, load_depth=True)
        return BatchLoader(
            ds, self.global_B // jax.process_count(), shuffle=True, drop_last=True,
            num_workers=self.cfg.num_workers, seed=self.cfg.seed + 1,
            shard=(jax.process_index(), jax.process_count()),
        )

    def put_batch(self, batch: Dict) -> Dict:
        """Host batch -> device, batch-sharded over the mesh.

        Single process: plain (async) device_put of the global batch.
        Multi-process: each host holds only its local shard, so assemble the
        global array from per-process local data."""
        shard = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(shard, np.asarray(x)),
                batch,
            )
        return jax.tree.map(lambda x: jax.device_put(x, shard), batch)

    def _device_prefetch(self, loader):
        """Double-buffer: issue the (async) host->device transfer of batch
        k+1 while the step on batch k runs — the reference relies on
        pin_memory + DataLoader workers for the same overlap."""
        it = iter(loader)
        pending = None
        for batch in it:
            device_batch = self.put_batch(self._train_keys_only(batch))
            if pending is not None:
                yield pending
            pending = device_batch
        if pending is not None:
            yield pending

    # ------------------------------------------------------------ train steps

    def _lr_schedule(self, lr_factor: float, steps_per_epoch: int):
        base = self.cfg.learning_rate * lr_factor
        step_size = self.cfg.scheduler_step_size

        def schedule(count):
            epoch = count // max(steps_per_epoch, 1)
            return base * (0.5 ** (epoch // step_size))

        return schedule

    def _build_phase(self, phase: str, steps_per_epoch: int):
        """Compile the shard_map-ped train step for a phase."""
        key = (phase, steps_per_epoch)
        if key in self._step_cache:
            return self._step_cache[key]

        cfg = self.cfg
        bool_cmp, bool_mask, networks, lr_factor = PHASE_SPEC[phase]
        automask = phase == "disp_init"
        trainable_modules = modules_for_networks(networks)
        tx = optax.adam(self._lr_schedule(lr_factor, steps_per_epoch))
        model = self.model
        trainer = self

        def loss_fn(t_params, f_params, batch_stats, batch, rng, step):
            params = merge_params(t_params, f_params)
            inputs = trainer.process_inputs_device(batch)
            rng_drop, rng_loss = jax.random.split(rng)
            outputs, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                inputs, train=True, bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask,
                mutable=["batch_stats"], rngs={"droppath": rng_drop},
            )
            outputs = _outputs_to_f32(outputs)
            view_synthesis(cfg, inputs, outputs,
                           bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask, automask=automask)
            losses = compute_losses(
                cfg, inputs, outputs, rng_loss,
                bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask, automask=automask,
                trainable_networks=networks,
                step_in_phase=step, steps_per_epoch=steps_per_epoch,
            )
            return losses["loss"], (losses, mut["batch_stats"])

        def device_step(t_params, f_params, batch_stats, opt_state, batch, rng, step):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (losses, new_bs)), grads = grad_fn(
                t_params, f_params, batch_stats, batch, rng, step
            )
            grads = jax.lax.pmean(grads, DATA_AXIS)        # DDP gradient averaging
            losses = jax.lax.pmean(losses, DATA_AXIS)
            new_bs = jax.lax.pmean(new_bs, DATA_AXIS)      # keep replicated invariant
            updates, new_opt = tx.update(grads, opt_state, t_params)
            t_params = optax.apply_updates(t_params, updates)
            return t_params, new_bs, new_opt, losses

        sharded = shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        step_fn = jax.jit(sharded, donate_argnums=(0, 2, 3))

        # Eval-mode step for validation monitoring (Trainer.py:175-195):
        # running batch stats, no grads, plus disp_scaled for depth metrics.
        def eval_step(variables, batch, rng, step):
            inputs = trainer.process_inputs_device(batch)
            rng_drop, rng_loss = jax.random.split(rng)
            outputs = _outputs_to_f32(model.apply(
                variables, inputs, train=False,
                bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask,
            ))
            view_synthesis(cfg, inputs, outputs,
                           bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask, automask=automask)
            losses = compute_losses(
                cfg, inputs, outputs, rng_loss,
                bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask, automask=automask,
                trainable_networks=networks,
                step_in_phase=step, steps_per_epoch=steps_per_epoch,
            )
            return losses, outputs[("disp_scaled", 0, 0)]

        # Visualization forward (compiled lazily, only when wandb vis is on):
        # returns the tensors for the 3x3 training grid (Trainer.py:607-654).
        def vis_step(variables, batch):
            inputs = trainer.process_inputs_device(batch)
            outputs = _outputs_to_f32(model.apply(
                variables, inputs, train=False,
                bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask,
            ))
            view_synthesis(cfg, inputs, outputs,
                           bool_CmpFlow=bool_cmp, bool_MotMask=bool_mask, automask=automask)
            f = cfg.frame_ids[1]
            return {
                "color": inputs[("color", 0, 0)],
                "recon": outputs[("color", f, 0)],
                "disp": outputs[("disp", 0, 0)],
                "mask": outputs[("motion_mask_r", f, 0)],
                "depth": outputs[("depth", 0, 0)],
                "independ_flow": outputs[("independ_flow", f, 0)],
                "K": inputs[("K", 0)],
                "inv_K": inputs[("inv_K", 0)],
                "T": outputs[("cam_T_cam", 0, f)],
            }

        built = {
            "step_fn": step_fn,
            "eval_fn": jax.jit(eval_step),
            "vis_fn": jax.jit(vis_step),
            "tx": tx,
            "networks": networks,
            "trainable_modules": trainable_modules,
            "bool_cmp": bool_cmp,
            "bool_mask": bool_mask,
            "automask": automask,
        }
        self._step_cache[key] = built
        return built

    # ---------------------------------------------------------------- training

    def train(self):
        """Run the full 4-phase curriculum (Trainer.py:90-106)."""
        self.setup_logging()
        self.g_step = 0
        steps_per_epoch = self.cfg.epoch_size if self.cfg.epoch_size > 0 else None

        for phase_i, phase in enumerate(PHASES):
            num_epoch = self.cfg.epoch_schedules[phase_i]
            self.print(f"======== {phase.upper()} - Num Epochs={num_epoch} ========")
            if num_epoch > 0:
                self.run_phase(phase, num_epoch)
            self.print(f"======== {phase.upper()} - Num Epochs={num_epoch} ========\n")

    def run_phase(self, phase: str, num_epoch: int):
        cfg = self.cfg
        # establish loader/steps count
        probe_loader = self._make_train_loader(epoch_seed=cfg.seed)
        steps_per_epoch = len(probe_loader)
        built = self._build_phase(phase, steps_per_epoch)

        t_params, f_params = partition_params(
            self.variables["params"], built["trainable_modules"]
        )
        batch_stats = self.variables.get("batch_stats", {})
        opt_state = built["tx"].init(t_params)
        if getattr(cfg, "resume_optim", False) and cfg.load_ckpt:
            # The reference saves adam.pth but never reloads it
            # (Trainer.py:706-707, model.py:174); we restore it when asked.
            restored = ckpt.load_opt_state(opt_state, osp.expanduser(cfg.load_ckpt))
            if restored is not None:
                opt_state = restored
                self.print(f"restored optimizer state from {cfg.load_ckpt}")
        t_params, f_params, batch_stats, opt_state = replicate_to_mesh(
            (t_params, f_params, batch_stats, opt_state), self.mesh
        )

        self.step = 0
        self.num_total_steps = steps_per_epoch * num_epoch
        self.start_time = time.time()
        self._val_iter = None

        if cfg.profile:
            from jax import profiler as _profiler

            trace_dir = join_dir(self.log_path, "traces", phase)
            _profiler.start_trace(trace_dir)

        for epoch in range(num_epoch):
            self.epoch = epoch
            self.print()
            # NOTE: python hash() is process-salted — never use it here, every
            # host must draw the same epoch sample (SURVEY §2.5).
            phase_idx = PHASES.index(phase)
            loader = self._make_train_loader(
                epoch_seed=cfg.seed + 1000 * epoch + 101 * phase_idx
            )
            loader.set_epoch(epoch)

            data_t, comp_t = 0.0, 0.0
            t0 = time.time()
            for batch_idx, device_batch in enumerate(self._device_prefetch(loader)):
                data_t += time.time() - t0
                t0 = time.time()

                self.rng, k = jax.random.split(self.rng)
                t_params, batch_stats, opt_state, losses = built["step_fn"](
                    t_params, f_params, batch_stats, opt_state, device_batch,
                    k, jnp.int32(self.step),
                )

                early_freq = cfg.log_frequency
                late_freq = 10 * early_freq
                if (batch_idx % early_freq == 0 and self.step < late_freq) or (
                    self.step % late_freq == 0
                ):
                    loss_val = float(losses["loss"])
                    dur = time.time() - t0
                    self.log_time(batch_idx, max(dur, 1e-9), loss_val, data_t, comp_t)
                    data_t, comp_t = 0.0, 0.0
                    self.log_scalars("train", losses)
                    self.log_vis("train", built, merge_params(t_params, f_params),
                                 batch_stats, device_batch)
                    self.val(built, merge_params(t_params, f_params), batch_stats)

                comp_t += time.time() - t0
                self.g_step += 1
                self.step += 1
                t0 = time.time()

            if ((epoch + 1) % cfg.save_frequency == 0) or (epoch == num_epoch - 1):
                self.variables = {
                    "params": merge_params(t_params, f_params),
                    "batch_stats": batch_stats,
                }
                self.save_model(phase, epoch, opt_state)

        self.variables = {
            "params": merge_params(t_params, f_params),
            "batch_stats": batch_stats,
        }
        if cfg.profile:
            from jax import profiler as _profiler

            _profiler.stop_trace()

    def val(self, built, params, batch_stats):
        """Evaluate one validation minibatch for training monitoring
        (Trainer.py:175-195 — val is never used for model selection)."""
        try:
            if self._val_iter is None:
                self._val_loader = self._make_val_loader()
                self._val_iter = iter(self._val_loader)
            try:
                batch = next(self._val_iter)
            except StopIteration:
                self._val_iter = iter(self._val_loader)
                batch = next(self._val_iter)
        except (FileNotFoundError, StopIteration):
            return  # no validation data available

        device_batch = self.put_batch(self._train_keys_only(batch))
        self.rng, k = jax.random.split(self.rng)
        losses, disp_scaled = built["eval_fn"](
            {"params": params, "batch_stats": batch_stats},
            device_batch, k, jnp.int32(self.step),
        )
        losses = dict(losses)
        if "depth_gt" in batch:
            # Multi-process: disp_scaled is the GLOBAL array and the host-
            # local batch["depth_gt"] rows are re-assembled onto the same
            # shard placement inside depth_metrics (put_batch semantics), so
            # prediction/ground-truth rows pair by construction and the
            # metrics are global-batch means — identical on every host and
            # equal to the single-process value. (The round-2 version
            # downloaded this host's shards and logged local-half metrics;
            # replaced after the round-3 two-process drive, see
            # scripts/two_process_drive.py.)
            losses.update(
                self.depth_metrics(batch, {("disp_scaled", 0, 0): disp_scaled})
            )
        self.log_scalars("val", losses)

    def _train_keys_only(self, batch: Dict) -> Dict:
        """Strip host-only keys the step doesn't consume."""
        drop = {"index", "gt_dim", "sem_mask", "mot_mask", "depth_gt", "depth_valid"}
        return {k: v for k, v in batch.items() if k not in drop}

    # ----------------------------------------------------------------- predict

    def predict(self, batch: Dict, bool_CmpFlow=False, bool_MotMask=False) -> Dict:
        """Jitted eval-mode forward for the eval CLIs (batch: numpy dict with
        ('color_aug', f, 0) keys at least).

        The batch dimension is sharded over the trainer mesh; a batch whose
        leading dim is not divisible by the mesh size is transparently padded
        (repeating the last item) and the outputs sliced back, so callers
        like eval/visualize.py's single-frame batches work on any mesh."""
        key = (bool_CmpFlow, bool_MotMask)
        if key not in self._predict_cache:
            model = self.model

            @jax.jit
            def fwd(variables, batch):
                return model.apply(
                    variables, batch, train=False,
                    bool_CmpFlow=bool_CmpFlow, bool_MotMask=bool_MotMask,
                )

            self._predict_cache[key] = fwd
        batch = {k: np.asarray(v) for k, v in batch.items()
                 if isinstance(k, tuple) and k[0] == "color_aug"}
        if not batch:
            raise ValueError(
                "predict() needs ('color_aug', <frame>, 0) keys in the batch; "
                "none were present")
        n = next(iter(batch.values())).shape[0]
        nproc = jax.process_count()
        if nproc > 1:
            # Multi-process: ``batch`` holds this host's LOCAL rows; put_batch
            # assembles the global batch (local rows land on this host's
            # shard positions, in process order). Padding would interleave
            # pad rows inside the global batch, so callers must feed rows
            # that already fill this host's devices evenly (the eval CLIs'
            # global batch is rounded to a mesh-divisible size).
            if n % max(self.n_dev // nproc, 1):
                raise ValueError(
                    f"multi-process predict() needs per-host batches divisible "
                    f"by the {self.n_dev // nproc} local devices, got {n} rows")
            return self._predict_cache[key](self.variables, self.put_batch(batch))
        pad = (-n) % self.n_dev
        if pad:
            batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                     for k, v in batch.items()}
        out = self._predict_cache[key](self.variables, self.put_batch(batch))
        if pad:
            out = jax.tree.map(lambda x: x[:n], out)
        return out

    def depth_metrics(self, inputs: Dict, outputs: Dict, mask_pts=None, labels=None,
                      sample_weight=None) -> Dict:
        """Batched depth metrics, batch-sharded over the trainer mesh so the
        per-sample metric core runs data-parallel (the prediction from
        ``predict`` is already sharded; the host-side ground truth is placed
        on the same sharding here)."""
        cfg = self.cfg
        shard = batch_sharding(self.mesh)

        def put(x):
            # Multi-process: the caller holds only its LOCAL batch rows
            # (loader shard) — assemble the global array exactly like
            # put_batch so rows pair with the prediction's shard placement.
            if jax.process_count() > 1:
                return jax.make_array_from_process_local_data(shard, np.asarray(x))
            return jax.device_put(jnp.asarray(x), shard)

        return depth_metrics(
            outputs[("disp_scaled", 0, 0)],
            put(inputs["depth_gt"]),
            put(inputs["depth_valid"]),
            put(inputs["gt_dim"]),
            np.asarray(cfg.eval_img_bound, np.float32),
            min_depth=cfg.eval_min_depth,
            max_depth=float(cfg.eval_max_depth),
            mask_pts=None if mask_pts is None else put(mask_pts),
            labels=labels,
            sample_weight=None if sample_weight is None else put(sample_weight),
        )

    # ------------------------------------------------------------------- io

    def save_model(self, phase: str, epoch: int, opt_state=None):
        if not is_main_process():
            return
        folder = join_dir(self.log_path, "models", f"{phase}_{epoch:02}")
        ckpt.save_model(self.variables, folder, height=self.H, width=self.W, verbose=True)
        if opt_state is not None:
            ckpt.save_opt_state(opt_state, folder)

    def load_model(self):
        path = osp.expanduser(self.cfg.load_ckpt)
        if not osp.isdir(path):
            path = self._try_fetch_zoo_ckpt(path)
        if not osp.isdir(path):
            raise FileNotFoundError(f"Cannot find checkpoint folder {path}")
        import glob

        if glob.glob(osp.join(path, "*.pth")) and not glob.glob(osp.join(path, "*.msgpack")):
            # released torch checkpoint: convert in place
            from dynamo_depth_tpu.models.convert import convert_torch_checkpoint

            self.print(f"converting torch checkpoint {path}")
            self.variables = convert_torch_checkpoint(path, self.variables, self.cfg)
        else:
            self.print(f"loading model from folder {path}")
            self.variables = ckpt.load_model(
                self.variables, path, height=self.H, width=self.W,
                verbose=is_main_process(),
            )

    def _try_fetch_zoo_ckpt(self, path: str) -> str:
        """Released-checkpoint auto-download (model.py:210-222): when the
        load path names a zoo entry, fetch it via gdown if the environment
        allows; otherwise fail with actionable instructions."""
        from dynamo_depth_tpu.models.convert import MODEL_ZOO

        if path not in MODEL_ZOO:
            return path
        gdrive_id = MODEL_ZOO[path]
        if gdrive_id is None:
            raise FileNotFoundError(
                f"{path} is Waymo-licensed; request access per the reference README "
                "and place the unzipped folder at that path."
            )
        self.print(f"Missing model checkpoint {path}, attempting download.")
        import os
        import subprocess

        name = path.split("/")[1]
        os.makedirs("./ckpt/", exist_ok=True)
        try:
            subprocess.run(["gdown", gdrive_id], check=True, timeout=600)
            subprocess.run(["unzip", "-o", f"{name}.zip"], check=True, timeout=300)
            os.replace(name, f"ckpt/{name}")
            os.remove(f"{name}.zip")
        except Exception as e:
            raise FileNotFoundError(
                f"Could not auto-download {path} ({e}). Download the reference "
                f"checkpoint (gdrive id {gdrive_id}), unzip to {path}, and re-run; "
                "the torch .pth files are converted automatically."
            )
        return path

    def save_opt(self):
        if not is_main_process():
            return
        models_dir = join_dir(self.log_path, "models")
        if self.cfg.print_opt:
            for k, v in self.cfg.to_dict().items():
                print("{:30}{}".format(k + ":", v))
        self.cfg.save(osp.join(models_dir, "opt.json"))

    # -------------------------------------------------------------- logging

    def setup_logging(self):
        self.save_opt()
        self._wandb = None
        if not self.cfg.no_train_vis:
            try:
                import wandb

                wandb.init(project="Dynamo", name=self.cfg.model_name,
                           notes=self.cfg.comment, config=self.cfg.to_dict())
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log_scalars(self, mode: str, losses: Dict):
        if self._wandb is None:
            return
        try:
            package = {f"{mode}_{k}": np.asarray(v).item() for k, v in losses.items()
                       if np.ndim(v) == 0}
            self._wandb.log(package, step=self.g_step)
        except Exception:
            pass

    def log_vis(self, mode, built, params, batch_stats, device_batch):
        """3x3 wandb visualization grid per sample (Trainer.py:607-654):
        [rgb | recon | scaled L1], [disp | mask | depth], [ego | independent |
        total flow colorwheels]."""
        if self._wandb is None or self.cfg.no_train_vis or not is_main_process():
            return
        from dynamo_depth_tpu.utils.vis import hsv_to_rgb, vis_motion

        out = jax.tree.map(
            np.asarray,
            built["vis_fn"]({"params": params, "batch_stats": batch_stats}, device_batch),
        )
        color, recon = out["color"], out["recon"]
        l1 = np.abs(color - recon).mean(-1, keepdims=True)
        l1 = l1 / (l1.max() + 1e-6)

        ego_hsv, ego_mag = vis_motion(out["depth"], out["K"], out["inv_K"],
                                      motion_map=None, camTcam=out["T"])
        ind_hsv, ind_mag = vis_motion(out["depth"], out["K"], out["inv_K"],
                                      motion_map=out["independ_flow"], camTcam=None)
        tot_hsv, tot_mag = vis_motion(out["depth"], out["K"], out["inv_K"],
                                      motion_map=out["independ_flow"], camTcam=out["T"])
        max_mag = max(ego_mag, ind_mag, tot_mag)
        for hsv, mag in ((ego_hsv, ego_mag), (ind_hsv, ind_mag), (tot_hsv, tot_mag)):
            hsv[..., 2] = np.clip(hsv[..., 2] * mag / max_mag, 0, 1)
        ego_f, ind_f, tot_f = (1 - hsv_to_rgb(h) for h in (ego_hsv, ind_hsv, tot_hsv))

        def rep3(x):
            return np.repeat(x, 3, axis=-1)

        package = {}
        for j in range(min(color.shape[0], self.B)):
            row1 = np.concatenate([color[j], recon[j], rep3(l1[j])], axis=1)
            row2 = np.concatenate(
                [rep3(out["disp"][j]), rep3(out["mask"][j]),
                 rep3(out["depth"][j] / out["depth"][j].max())], axis=1)
            row3 = np.concatenate([ego_f[j], ind_f[j], tot_f[j]], axis=1)
            grid = np.clip(np.concatenate([row1, row2, row3], axis=0), 0, 1)
            package[f"vis/{mode}_{j}"] = self._wandb.Image(grid)
        try:
            self._wandb.log(package, step=self.g_step)
        except Exception:
            pass

    def log_time(self, batch_idx, duration, loss, data_time, gpu_time):
        if not is_main_process():
            return
        samples_per_sec = self.global_B / duration
        time_sofar = time.time() - self.start_time
        left = (self.num_total_steps / self.step - 1.0) * time_sofar if self.step > 0 else 0
        print(
            f"epoch {self.epoch:>3} | batch {batch_idx:>6} | examples/s: {samples_per_sec:5.1f} "
            f"| loss: {loss:.5f} | time elapsed: {sec_to_hm_str(time_sofar)} "
            f"| time left: {sec_to_hm_str(left)} | CPU/TPU time: {data_time:0.1f}s/{gpu_time:0.1f}s"
        )

    def print(self, s=""):
        if is_main_process():
            print(s)
