"""Two-phase training orchestration — the reference ``run_pipnet``
(main.py:42-496) rebuilt around a single jitted train step.

Phase structure parity:
* Phase 1 (prototype pretraining, main.py:238-295): align weight ramps
  epoch/nr_epochs, tanh weight 5, class weight 0; classifier + intermediate
  frozen, backbone early stages frozen; Gumbel tau annealed 1.0 -> 0.1 with
  a 25% stabilization tail; net LR on per-iteration cosine
  (T_max = len(loader)*epochs, eta_min=lr_block/100).
* Phase 2 (main.py:305-437): align 5 / tanh 2 / class 2; finetune window
  (classifier+intermediate only) for the first epochs_finetune epochs;
  freeze_epochs += epochs_finetune; backbone unfreezes after freeze_epochs;
  Count-PIPNet without STE trains the classifier only, forever; periodic
  weight zeroing every 30 epochs and at the last; per-epoch eval, CSV
  logging, rolling/best checkpoints; classifier LR on warm restarts
  (T_0 = 5 or 10, eta_min=1e-3) with fractional epoch stepping.

All phase logic lands in a per-step dict of runtime scalars, so the whole
run uses ONE compiled train step (no recompiles at phase boundaries).
"""

import os
import time
from collections import deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import save_args
from ..models.pipnet import get_pipnet, get_count_network
from ..parallel.mesh import make_mesh, shard_batch, replicate
from ..utils.log import Log
from ..utils.checkpoint import (
    CheckpointManager, load_backbone_only, find_shared_backbone,
)

from .optim import (
    label_params, adamw_init, cosine_lr, warm_restart_lr,
    NET_LABELS, CLASSIFIER_LABELS,
)
from .steps import make_train_step, make_eval_step
from .eval import evaluate

__all__ = ["run_pipnet", "Trainer"]

LOG_COLUMNS = (
    "test_top1_acc", "local_size_for_true_class",
    "local_size_for_all_classes", "prototypes_per_class",
    "almost_nonzeros_pooled", "num_nonzero_prototypes", "mean_train_acc",
    "mean_train_loss_during_epoch", "align_loss_raw", "tanh_loss_raw",
    "class_loss_raw", "align_loss_weighted", "tanh_loss_weighted",
    "class_loss_weighted",
)


def _classifier_init(params, rng, bias: bool):
    """Reference classifier init (main.py:166-172): weight ~ N(1.0, 0.1),
    multiplier = 2 (never trained), bias = 0."""
    clf = dict(params["classification"])
    clf["weight"] = 1.0 + 0.1 * jax.random.normal(
        rng, clf["weight"].shape, jnp.float32)
    clf["multiplier"] = jnp.full_like(clf["multiplier"], 2.0)
    if bias and "bias" in clf:
        clf["bias"] = jnp.zeros_like(clf["bias"])
    out = dict(params)
    out["classification"] = clf
    return out


def _masks(trainable_labels) -> Dict[str, float]:
    return {k: (1.0 if k in trainable_labels else 0.0)
            for k in NET_LABELS + CLASSIFIER_LABELS}


class Trainer:
    """Stateful host-side orchestrator around the pure jitted steps."""

    def __init__(self, args, num_classes: int, classes=None, mesh=None):
        self.args = args
        self.num_classes = num_classes
        self.classes = classes
        self.dtype = (jnp.bfloat16 if getattr(args, "dtype", "bfloat16") ==
                      "bfloat16" else jnp.float32)
        self.mesh = mesh or make_mesh(getattr(args, "mesh_shape", -1))
        self.is_count = getattr(args, "model", "pipnet") == "count_pipnet"
        self.use_gumbel = (getattr(args, "activation", "gumbel_softmax")
                           == "gumbel_softmax")

        if self.is_count:
            self.model, self.num_prototypes = get_count_network(
                num_classes, args, max_count=getattr(args, "max_count", 3),
                use_ste=getattr(args, "use_ste", False), dtype=self.dtype)
        else:
            self.model, self.num_prototypes = get_pipnet(
                num_classes, args, dtype=self.dtype)

        self.rng = jax.random.PRNGKey(args.seed)
        self.tau = 1.0
        self._init_state()

        self.labels = label_params(
            self.params, args.net,
            use_mid_layers=getattr(args, "use_mid_layers", False),
            num_stages=getattr(args, "num_stages", 2),
            train_intermediate=getattr(args, "train_intermediate", True),
            bias=getattr(args, "bias", False))

        class_weights = None
        # (class weighting happens through the weighted sampler in the
        # loader, like the reference; per-class loss weights stay None)
        self._step_kwargs = dict(
            is_count_pipnet=self.is_count,
            enforce_weight_sparsity=getattr(args, "enforce_weight_sparsity",
                                            True),
            tanh_loss_coeff=getattr(args, "tanh_loss_coeff", 1.0),
            weight_decay=args.weight_decay, class_weights=class_weights)
        self.train_step = make_train_step(
            self.model, self.labels, **self._step_kwargs)
        # phase-DCE'd step variants, keyed by the frozen-label set
        # (see make_train_step frozen_labels); the plain step above stays
        # as the fallback / external entry point.
        self._phase_steps = {}
        self.eval_step = make_eval_step(self.model,
                                        num_classes=num_classes)
        self.opt_state = adamw_init(self.params)
        self._replicate_all()

    # -- state management ---------------------------------------------------
    def _init_state(self):
        img = getattr(self.args, "image_size", 224)
        dummy = jnp.zeros((2, img, img, 3), jnp.float32)
        self.rng, pk, gk, ck = jax.random.split(self.rng, 4)
        variables = self.model.init(
            {"params": pk, "gumbel": gk}, dummy)
        params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.params = _classifier_init(params, ck,
                                       getattr(self.args, "bias", False))

    def _replicate_all(self):
        self.params = replicate(self.mesh, self.params)
        self.opt_state = replicate(self.mesh, self.opt_state)
        if self.batch_stats:
            self.batch_stats = replicate(self.mesh, self.batch_stats)

    def reinit_optimizers(self):
        """Fresh Adam moments — the reference re-creates both optimizers at
        the phase-2 boundary (main.py:305-308)."""
        self.opt_state = replicate(self.mesh, adamw_init(self.params))

    def probe_wshape(self, loader) -> int:
        """One forward to record the latent grid size
        (reference main.py:211-218)."""
        batch = next(iter(loader))
        xs1 = jnp.asarray(batch[0][:1])  # keep dtype (uint8 transport)
        cfg = getattr(loader, "device_augment_cfg", None)
        if cfg is None and jnp.issubdtype(xs1.dtype, jnp.integer):
            # uint8 transport without device augmentation: apply the same
            # Normalize the host float pipeline (ToArray + Normalize) would
            from ..data.augment import IMAGENET_MEAN, IMAGENET_STD
            xs1 = xs1.astype(jnp.float32) / 255.0
            xs1 = (xs1 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
                IMAGENET_STD)
        elif cfg is None:
            xs1 = xs1.astype(jnp.float32)
        if cfg is not None:
            from ..data.device_augment import make_device_twoview_augment
            xs1, _ = make_device_twoview_augment(cfg)(
                jax.random.PRNGKey(0), xs1)
        self.rng, gk = jax.random.split(self.rng)
        proto, _, _ = self.model.apply(
            {"params": self.params, **self._mstate()}, xs1,
            rngs={"gumbel": gk})
        wshape = proto.shape[2]
        self.args.wshape = wshape
        print("Output shape:", proto.shape, flush=True)
        return wshape

    def _mstate(self):
        return ({"batch_stats": self.batch_stats}
                if self.batch_stats else {})

    # -- per-epoch mask/weight schedules ------------------------------------
    def pretrain_masks(self):
        # main.py:238-253
        return _masks({"to_train", "to_freeze", "add_on"})

    def main_masks(self, epoch: int, epochs_to_finetune: int,
                   freeze_epochs: int):
        # main.py:333-390
        count_no_ste = self.is_count and not getattr(self.args, "use_ste",
                                                     False)
        if epoch <= epochs_to_finetune:
            labels = {"cls_weight", "cls_bias", "intermediate"}
            finetune = True
        elif count_no_ste:
            labels = {"cls_weight", "cls_bias"}
            finetune = False
        elif epoch <= freeze_epochs:
            labels = {"to_train", "to_freeze", "add_on", "intermediate",
                      "cls_weight", "cls_bias"}
            finetune = False
        else:
            labels = {"backbone", "to_train", "to_freeze", "add_on",
                      "intermediate", "cls_weight", "cls_bias"}
            finetune = False
        if not getattr(self.args, "train_intermediate", True):
            labels.discard("intermediate")
        return _masks(labels), finetune

    # -- epoch loops --------------------------------------------------------
    def train_epoch(self, loader, epoch: int, nr_epochs: int, *,
                    pretrain: bool, finetune: bool, masks: Dict[str, float],
                    net_sched: Dict, cls_sched: Optional[Dict],
                    bb_warmup: Optional[tuple] = None) -> Dict:
        """One epoch over ``loader``. net_sched: {"kind": "cosine",
        "T": total_steps, "eta_min": float, "step": mutable count};
        cls_sched: {"T0": int, "eta_min": float} or None; bb_warmup:
        (freeze_epochs, warmup_epochs) — linear per-step LR ramp on the
        "backbone" label over the first warmup_epochs after the
        unfreeze boundary (--unfreeze_warmup_epochs; LR is a runtime
        scalar so the ramp never recompiles)."""
        args = self.args
        if pretrain:
            align_w, t_w, cl_w = (epoch / nr_epochs) * 1.0, 5.0, 0.0
        else:
            align_w, t_w, cl_w = 5.0, 2.0, 2.0
        print("Align weight:", align_w, ", U_tanh weight:", t_w,
              "Class weight:", cl_w, flush=True)
        print("Pretrain?", pretrain, "Finetune?", finetune, flush=True)

        # Device-side photometric augmentation (data/device_augment.py):
        # the loader ships t1 crops; both views are produced on-device.
        dev_aug_cfg = getattr(loader, "device_augment_cfg", None)
        dev_aug = None
        if dev_aug_cfg is not None:
            if not hasattr(self, "_dev_aug_fns"):
                self._dev_aug_fns = {}
            if dev_aug_cfg not in self._dev_aug_fns:
                from ..data.device_augment import \
                    make_device_twoview_augment
                self._dev_aug_fns[dev_aug_cfg] = \
                    make_device_twoview_augment(dev_aug_cfg)
            dev_aug = self._dev_aug_fns[dev_aug_cfg]

        # Host-local loaders (multi-host) yield only this process's slice
        # of the global batch; assemble the global array from local shards.
        if getattr(loader, "host_local", False):
            from ..parallel.distributed import shard_host_local_batch
            feed = lambda tree: shard_host_local_batch(self.mesh, tree)  # noqa: E731
        else:
            feed = lambda tree: shard_batch(self.mesh, tree)  # noqa: E731

        # Pick the phase's compiled step: frozen labels (mask 0.0, plus the
        # permanent "frozen" group) are baked in statically so XLA drops
        # their backward entirely — torch requires_grad semantics
        # (reference main.py:238-253,333-390). --no_phase_dce falls back to
        # the single runtime-masked step.
        if getattr(args, "no_phase_dce", False):
            step_fn = self.train_step
        else:
            frozen = frozenset(
                k for k, v in masks.items() if v == 0.0) | {"frozen"}
            if frozen not in self._phase_steps:
                self._phase_steps[frozen] = make_train_step(
                    self.model, self.labels, frozen_labels=frozen,
                    **self._step_kwargs)
            step_fn = self._phase_steps[frozen]

        loader.set_epoch(epoch)
        iters = len(loader)
        totals = {k: 0.0 for k in
                  ("loss", "acc", "align", "tanh", "class",
                   "align_weighted", "tanh_weighted", "class_weighted")}
        lrs_net, lrs_class = [], []
        n = 0

        # Step pipelining: metrics are tiny scalars only needed at epoch
        # end, but fetching them every step blocks the host on the
        # device finishing step i before it decodes/feeds step i+1 —
        # serializing host and device work (the reference's torch loop
        # overlaps them for free via CUDA streams + DataLoader workers).
        # Keep up to --pipeline_depth step dispatches in flight and
        # drain the oldest metrics only when the window is full: the
        # host runs ahead, the loader thread decodes under the fetch
        # wait, and device-step i+1 is queued before i completes.
        depth = max(int(getattr(args, "pipeline_depth", 2)), 0)
        pending: deque = deque()

        def _drain_one():
            m = jax.device_get(pending.popleft())
            totals["loss"] += float(m["loss"])
            totals["acc"] += float(m["acc"])
            for k in ("align", "tanh", "class", "align_weighted",
                      "tanh_weighted", "class_weighted"):
                totals[k] += float(m[k])

        t0 = time.time()
        for i, host_batch in enumerate(loader):
            # host-side per-step LR (exact torch stepping semantics; the
            # counter itself is only advanced outside finetune below, so
            # finetune epochs see a frozen net LR)
            lr_net_fac = net_sched["step"]
            lr = {
                "backbone": cosine_lr(args.lr_net, lr_net_fac,
                                      net_sched["T"], net_sched["eta_min"]),
                "to_freeze": cosine_lr(args.lr_block, lr_net_fac,
                                       net_sched["T"], net_sched["eta_min"]),
                "to_train": cosine_lr(args.lr_block, lr_net_fac,
                                      net_sched["T"], net_sched["eta_min"]),
                "add_on": cosine_lr(args.lr_block * 10.0, lr_net_fac,
                                    net_sched["T"], net_sched["eta_min"]),
            }
            if bb_warmup is not None and not pretrain:
                fz, nwu = bb_warmup
                if nwu > 0 and epoch > fz:
                    prog = (epoch - 1 - fz + i / max(iters, 1)) / nwu
                    lr["backbone"] *= min(1.0, max(0.0, prog))
            if cls_sched is not None and not pretrain:
                frac = epoch - 1 + i / max(iters, 1)
                lr_cls = warm_restart_lr(args.lr, frac, cls_sched["T0"],
                                         cls_sched["eta_min"])
            else:
                lr_cls = 0.0
            lr.update({"cls_weight": lr_cls, "cls_bias": lr_cls,
                       "intermediate": lr_cls})

            sched = {
                "lr": {k: jnp.float32(v) for k, v in lr.items()},
                "mask": {k: jnp.float32(v) for k, v in masks.items()},
                "align_w": jnp.float32(align_w),
                "tanh_w": jnp.float32(t_w),
                "class_w": jnp.float32(cl_w),
                "pretrain": jnp.float32(1.0 if pretrain else 0.0),
                "finetune": jnp.float32(1.0 if finetune else 0.0),
                "tau": jnp.float32(self.tau),
                "project": jnp.float32(0.0 if pretrain else 1.0),
            }

            if dev_aug is not None:
                xs1, ys = host_batch  # single-view host pipeline
                # keep the loader's dtype (uint8 transport): the device
                # converts to [0,1] float inside dev_aug
                raw, ys_s = feed((
                    np.asarray(xs1),
                    np.asarray(ys, np.int32)))
                self.rng, akey = jax.random.split(self.rng)
                v1, v2 = dev_aug(akey, raw)
                batch = (v1, v2, ys_s)
            else:
                xs1, xs2, ys = host_batch
                batch = feed((
                    np.asarray(xs1, np.float32),
                    np.asarray(xs2, np.float32),
                    np.asarray(ys, np.int32)))
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, mstate, self.opt_state, metrics = step_fn(
                self.params, self._mstate(), self.opt_state, batch,
                step_rng, sched)
            if "batch_stats" in mstate:
                self.batch_stats = mstate["batch_stats"]

            if not finetune:
                net_sched["step"] += 1
                lrs_net.append(lr["backbone"])
            else:
                lrs_net.append(0.0)
            if not pretrain:
                lrs_class.append(lr_cls)

            pending.append(metrics)
            if len(pending) > depth:
                _drain_one()
            n += 1

        while pending:
            _drain_one()
        dt = time.time() - t0
        n = max(n, 1)
        info = {
            "loss": totals["loss"] / n,
            "train_accuracy": totals["acc"] / n,
            "align_loss_raw": totals["align"] / n,
            "tanh_loss_raw": totals["tanh"] / n,
            "class_loss_raw": totals["class"] / n,
            "align_loss_weighted": totals["align_weighted"] / n,
            "tanh_loss_weighted": totals["tanh_weighted"] / n,
            "class_loss_weighted": totals["class_weighted"] / n,
            "lrs_net": lrs_net, "lrs_class": lrs_class,
            "epoch_time_s": dt,
            "steps_per_s": n / dt if dt > 0 else 0.0,
        }
        print(f"\nEpoch {epoch} loss breakdown:")
        print(f"  Alignment loss: {info['align_loss_raw']:.4f} (raw), "
              f"{info['align_loss_weighted']:.4f} (weighted)")
        print(f"  Tanh loss: {info['tanh_loss_raw']:.4f} (raw), "
              f"{info['tanh_loss_weighted']:.4f} (weighted)")
        print(f"  Classification loss: {info['class_loss_raw']:.4f} (raw), "
              f"{info['class_loss_weighted']:.4f} (weighted)")
        print(f"  Epoch time: {dt:.1f}s ({info['steps_per_s']:.2f} steps/s)",
              flush=True)
        return info

    def update_temperature(self, new_tau: float):
        """Gumbel tau is a runtime scalar — no module mutation, no
        recompile (reference count_pipnet.py:156-168)."""
        self.tau = float(new_tau)

    def anneal_tau(self, epoch: int):
        """Pretraining annealing 1.0 -> 0.1 with 25% stabilization tail
        (reference main.py:264-290)."""
        total = self.args.epochs_pretrain
        stabilization = int(total * 0.25)
        annealing = max(total - stabilization, 1)
        if epoch <= annealing:
            tau = 1.0 - (1.0 - 0.1) * (epoch / annealing)
        else:
            tau = 0.1
        self.update_temperature(tau)
        print(f"Updated Gumbel-Softmax temperature to {tau:.3f} "
              f"(Pretraining phase)", flush=True)

    def zero_small_weights(self):
        """Periodic weight zeroing (reference main.py:395-403)."""
        clf = dict(self.params["classification"])
        clf["weight"] = jnp.maximum(clf["weight"] - 0.001, 0.0)
        params = dict(self.params)
        params["classification"] = clf
        self.params = params
        nz = int(jnp.count_nonzero(clf["weight"]))
        print(f"Classifier weights: {nz} non-zero entries after zeroing",
              flush=True)


def _plot_lrs(values, path):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.clf()
        plt.plot(values)
        plt.savefig(path)
        plt.close()
    except Exception as e:  # pragma: no cover
        print(f"lr plot skipped: {e}")


def run_pipnet(args):
    """Full training run — reference main.py:42-496."""
    from ..data.registry import get_dataloaders, validate_dataset_paths

    # Fail fast on missing dataset directories BEFORE the first jax
    # device touch (jax.process_index below claims the single TPU; a
    # client that dies holding the claim wedges the chip for minutes).
    validate_dataset_paths(args)

    # Multi-host runs execute the full trainer on every process (SPMD),
    # but only process 0 may touch shared files: checkpoints, CSV logs,
    # LR plots, and visualization artifacts all live under args.log_dir,
    # and concurrent same-path writes from N hosts can corrupt them.
    is_main = jax.process_index() == 0

    log = Log(args.log_dir)
    print("Log dir:", args.log_dir, flush=True)
    if is_main:
        save_args(args, log.metadata_dir)

    (trainloader, trainloader_pretraining, trainloader_normal,
     trainloader_normal_augment, projectloader, testloader,
     test_projectloader, classes) = get_dataloaders(args)
    num_classes = len(classes)

    ckpt = CheckpointManager(args)
    trainer = Trainer(args, num_classes, classes=classes)
    start_epoch = 1
    resumed = False

    # -- resume / shared backbone / pretrained discovery (main.py:122-205).
    # Resume takes precedence: a chunked/interrupted run with a shared
    # backbone must continue from its net_trained_last, not restart from
    # epoch 1 off the shared weights (which would loop the chunk wrapper
    # forever at zero progress).
    shared_loaded = False
    if getattr(args, "resume_training", False):
        target = {"params": jax.device_get(trainer.params),
                  "batch_stats": jax.device_get(trainer.batch_stats),
                  "opt_state": jax.device_get(trainer.opt_state)}
        res = ckpt.load_trained_checkpoint(target)
        if res is not None:
            state, meta = res
            trainer.params = replicate(trainer.mesh, state["params"])
            trainer.batch_stats = state.get("batch_stats", {})
            if state.get("opt_state"):
                trainer.opt_state = replicate(trainer.mesh,
                                              state["opt_state"])
            args.epochs_pretrain = 0
            if meta.get("epoch") not in (None, "last"):
                start_epoch = int(meta["epoch"]) + 1
            if meta.get("tau") is not None:
                # continue at the annealed Gumbel temperature (the
                # reference loses tau on resume — see
                # CheckpointManager.save_trained_checkpoint)
                trainer.update_temperature(meta["tau"])
            resumed = True
            print(f"Resuming training from epoch {start_epoch}",
                  flush=True)

    if not resumed and getattr(args, "shared_pretrained_dir", ""):
        cand = find_shared_backbone(args.shared_pretrained_dir)
        if cand:
            new_params, inf = load_backbone_only(
                cand, jax.device_get(trainer.params))
            if inf["success"]:
                trainer.params = replicate(trainer.mesh, new_params)
                shared_loaded = True
                args.epochs_pretrain = 0
                print("Successfully loaded shared pretrained backbone",
                      flush=True)

    if not shared_loaded:
        if not resumed:
            target = {"params": jax.device_get(trainer.params),
                      "batch_stats": jax.device_get(trainer.batch_stats),
                      "opt_state": {}}
            res = ckpt.load_pretrained_checkpoint(target)
            if res is not None:
                state, _ = res
                trainer.params = replicate(trainer.mesh, state["params"])
                args.epochs_pretrain = 0
                print("Loaded pretrained checkpoint from standard location",
                      flush=True)
            # else: fresh init already done in Trainer.__init__

    wshape = trainer.probe_wshape(trainloader)

    if is_main:
        # keep prior rows only when actually resuming; a fresh run
        # reusing a log_dir truncates, like the reference (util/log.py:48)
        log.create_log("log_epoch_overview", "epoch", *LOG_COLUMNS,
                       append=resumed)

    # ---------------- PHASE 1: prototype pretraining ----------------------
    pre_iters = len(trainloader_pretraining)
    net_sched = {"T": pre_iters * args.epochs_pretrain,
                 "eta_min": args.lr_block / 100.0, "step": 0}
    lrs_pretrain = []
    for epoch in range(1, args.epochs_pretrain + 1):
        print("\nPretrain Epoch", epoch, "with batch size",
              trainloader_pretraining.batch_size, flush=True)
        info = trainer.train_epoch(
            trainloader_pretraining, epoch, args.epochs_pretrain,
            pretrain=True, finetune=False, masks=trainer.pretrain_masks(),
            net_sched=net_sched, cls_sched=None)
        if trainer.is_count and trainer.use_gumbel:
            trainer.anneal_tau(epoch)
        lrs_pretrain += info["lrs_net"]
        if is_main:
            _plot_lrs(lrs_pretrain, os.path.join(args.log_dir,
                                                 "lr_pretrain_net.png"))
            log.log_values(
                "log_epoch_overview", epoch, "n.a.", "n.a.", "n.a.", "n.a.",
                "n.a.", "n.a.", "n.a.", info["loss"],
                info["align_loss_raw"], info["tanh_loss_raw"], "n.a.",
                info["align_loss_weighted"], info["tanh_loss_weighted"],
                "n.a.")

    if args.epochs_pretrain > 0 and not resumed and is_main:
        ckpt.save_pretrained_checkpoint(
            jax.device_get(trainer.params),
            jax.device_get(trainer.batch_stats))

    if is_main:
        try:
            from ..interpret.vis_pipnet import vizualize_network
            vizualize_network(
                trainer, projectloader, num_classes,
                "visualised_pretrained_prototypes_topk", args, k=10,
                are_pretraining_prototypes=True, plot_histograms=False,
                visualize_prototype_maps=False,
                plot_topk=getattr(args, "viz_topk", True))
        except Exception as e:
            print(f"(pretrain prototype visualization skipped: {e})",
                  flush=True)

    # ---------------- PHASE 2: classification training --------------------
    if not resumed:
        trainer.reinit_optimizers()
    iters = len(trainloader)
    # On resume, continue the per-iteration cosine from where the
    # interrupted run left it (finetune epochs don't advance the
    # counter, so subtract them; matches the torch closed form the
    # non-resumed path follows).
    done_epochs = max(0, start_epoch - 1 - args.epochs_finetune)
    net_sched = {"T": iters * args.epochs, "eta_min": args.lr_net / 100.0,
                 "step": done_epochs * iters}
    cls_sched = {"T0": 5 if args.epochs <= 30 else 10, "eta_min": 0.001}

    epochs_to_finetune = args.epochs_finetune
    freeze_epochs = args.freeze_epochs + epochs_to_finetune  # main.py:326

    # First-class step tracing (SURVEY.md §5: the reference has no
    # profiling; tqdm postfixes were its only instrumentation).
    profile_dir = getattr(args, "profile_dir", "")
    profiled = False

    # --max_epochs_per_process: bound how many LEAKING epochs one process
    # runs before exiting with a resumable checkpoint. The remote TPU
    # client leaks host memory per dispatch (~2.8 GB/epoch at the
    # flagship shape, BENCH_NOTES.md) — long runs get OOM-killed around
    # 45 epochs; scripts/train_chunked.py re-invokes with
    # --resume_training until done. 0 disables. Pretrain epochs leak
    # just like main epochs, so they count against the first chunk's
    # budget (pretraining itself is not resumable — net_pretrained only
    # exists once the phase completes — so the first chunk always runs
    # all of it plus at least one main epoch to guarantee progress).
    chunk_budget = int(getattr(args, "max_epochs_per_process", 0) or 0)
    chunk_stopped = False
    chunk_marker = os.path.join(args.log_dir, "checkpoints",
                                "CHUNK_CONTINUE")

    lrs_net, lrs_class = [], []
    eval_rng = jax.random.PRNGKey(args.seed + 7)
    epochs_this_process = args.epochs_pretrain  # 0 unless run just above
    for epoch in range(start_epoch, args.epochs + 1):
        masks, finetune = trainer.main_masks(epoch, epochs_to_finetune,
                                             freeze_epochs)
        print("\n Epoch", epoch, "finetune:", finetune, flush=True)
        if (getattr(args, "enforce_weight_sparsity", True)
                and (epoch == args.epochs or epoch % 30 == 0)
                and args.epochs > 1):
            trainer.zero_small_weights()

        if profile_dir and not profiled:
            from jax import profiler as _jprof
            _jprof.start_trace(profile_dir)
        info = trainer.train_epoch(
            trainloader, epoch, args.epochs, pretrain=False,
            finetune=finetune, masks=masks, net_sched=net_sched,
            cls_sched=cls_sched,
            bb_warmup=(freeze_epochs,
                       int(getattr(args, "unfreeze_warmup_epochs", 0))))
        if profile_dir and not profiled:
            from jax import profiler as _jprof
            _jprof.stop_trace()
            profiled = True
            print(f"Profiler trace written to {profile_dir}", flush=True)
        lrs_net += info["lrs_net"]
        lrs_class += info["lrs_class"]

        eval_rng, sub = jax.random.split(eval_rng)
        eval_info, new_params = evaluate(
            trainer.model, trainer.params, trainer.batch_stats, testloader,
            epoch, num_classes=num_classes,
            enforce_weight_sparsity=getattr(args, "enforce_weight_sparsity",
                                            True),
            rng=sub, tau=trainer.tau, eval_step=trainer.eval_step,
            pipeline_depth=getattr(args, "pipeline_depth", 2))
        trainer.params = new_params

        if is_main:
            log.log_values(
                "log_epoch_overview", epoch, eval_info["top1_accuracy"],
                eval_info["local_size_for_true_class"],
                eval_info["local_size_for_all_classes"],
                eval_info["prototypes_per_class"],
                eval_info["almost_nonzeros"],
                eval_info["num non-zero prototypes"],
                info["train_accuracy"], info["loss"],
                info["align_loss_raw"], info["tanh_loss_raw"],
                info["class_loss_raw"], info["align_loss_weighted"],
                info["tanh_loss_weighted"], info["class_loss_weighted"])

            host_params = jax.device_get(trainer.params)
            host_stats = jax.device_get(trainer.batch_stats)
            host_opt = jax.device_get(trainer.opt_state)
            ckpt.save_trained_checkpoint(host_params, host_stats, host_opt,
                                         epoch, tau=trainer.tau)
            ckpt.save_best_checkpoint(host_params, host_stats, host_opt,
                                      epoch, eval_info["top1_accuracy"])
            _plot_lrs(lrs_net, os.path.join(args.log_dir, "lr_net.png"))
            _plot_lrs(lrs_class, os.path.join(args.log_dir, "lr_class.png"))

        # checking AFTER the first main epoch of the chunk guarantees
        # progress even when epochs_pretrain alone exceeds the budget
        epochs_this_process += 1
        if (chunk_budget and epochs_this_process >= chunk_budget
                and epoch < args.epochs):
            chunk_stopped = True
            if is_main:
                with open(chunk_marker, "w") as f:
                    f.write(str(epoch))
            print(f"\nChunk budget of {chunk_budget} epochs reached at "
                  f"epoch {epoch}/{args.epochs}; resume with "
                  "--resume_training to continue.", flush=True)
            break

    if chunk_stopped:
        # per-epoch net_trained_last (with an integer epoch in its
        # metadata) is the resume point; skip the final-"last" overwrite
        # and the best-model visualization — the finishing chunk does it
        return trainer

    if is_main and os.path.exists(chunk_marker):
        os.remove(chunk_marker)

    if args.epochs > 1 and is_main:
        # the reference saves this role under the name "last"
        # (checkpoint_manager.py:149-191); keep the FINAL EPOCH NUMBER in
        # the metadata so --resume_training on a finished run continues
        # past it (epoch extension) instead of restarting from epoch 1
        ckpt.save_trained_checkpoint(
            jax.device_get(trainer.params),
            jax.device_get(trainer.batch_stats),
            jax.device_get(trainer.opt_state), args.epochs,
            tau=trainer.tau)

    # -- best-model reload + prototype visualization (main.py:446-458)
    print("\nLoading best model for prototype visualization...", flush=True)
    if jax.process_count() > 1:
        # Non-main processes skip the is_main-gated saves above; barrier
        # so none of them reads net_best before process 0 finishes
        # writing it (saves themselves are atomic tmp+rename).
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("best_checkpoint_written")
    best = ckpt.load_best_checkpoint()
    if jax.process_count() > 1:
        # All hosts must take the same branch below (the reload feeds
        # sharded eval/viz); a host that can't see process 0's file means
        # log_dir isn't shared — fail loudly instead of diverging.
        have = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(best is not None)))
        if have != (best is not None):
            raise RuntimeError(
                "net_best checkpoint visible on process 0 but not on "
                f"process {jax.process_index()}: --log_dir must be on a "
                "filesystem shared across hosts")
    if best is not None:
        state, meta = best
        trainer.params = replicate(trainer.mesh, state["params"])
        trainer.batch_stats = state.get("batch_stats", {})
        print(f"Loaded best model from epoch {meta.get('epoch')} with "
              f"accuracy {meta.get('accuracy', 0):.4f}", flush=True)
        if is_main:
            try:
                from ..interpret.vis_pipnet import vizualize_network
                folder = (f"visualised_prototypes_topk_best_model_epoch"
                          f"{meta.get('epoch')}")
                vizualize_network(
                    trainer, projectloader, num_classes, folder, args,
                    plot_histograms=getattr(args, "viz_histograms", False),
                    visualize_prototype_maps=getattr(
                        args, "viz_prototype_maps", True),
                    plot_topk=getattr(args, "viz_topk", True),
                    are_pretraining_prototypes=False)
            except Exception as e:
                print(f"(prototype visualization skipped: {e})", flush=True)
    else:
        print("Failed to load best model for prototype visualization",
              flush=True)

    # The learned scoring sheet: relevant prototypes per class (the
    # reference README documents this out.txt content; README.md:58).
    try:
        from .eval import class_prototype_weights
        host_params = jax.device_get(trainer.params)
        cpw = np.asarray(class_prototype_weights(trainer.model,
                                                 host_params))
        for c in range(num_classes):
            relevant = [(p, float(cpw[c, p]))
                        for p in range(cpw.shape[1]) if cpw[c, p] > 1e-3]
            relevant.sort(key=lambda t: -t[1])
            name = classes[c] if classes and c < len(classes) else c
            print(f"Class {c} ({name}): has {len(relevant)} relevant "
                  f"prototypes: {relevant}", flush=True)
    except Exception as e:
        print(f"(scoring-sheet printout skipped: {e})", flush=True)

    # --interpret: run the interpretability suite on the finished model
    # (the reference ships interpret_idg/vis_pred as separate scripts;
    # here one flag drives them off the just-trained best checkpoint).
    if getattr(args, "interpret", False) and is_main:
        try:
            from ..data.registry import DATASET_RECIPES
            from ..interpret.visualize_prediction import vis_pred
            _, (_tr, _pr, test_d, *_rest) = DATASET_RECIPES[args.dataset]
            if test_d is not None and os.path.isdir(test_d):
                vis_pred(trainer, test_d, classes, args)
        except Exception as e:
            print(f"(prediction explanations skipped: {e})", flush=True)
        try:
            from ..interpret.histograms import \
                plot_prototype_activations_by_class
            plot_prototype_activations_by_class(
                trainer, projectloader, num_classes,
                os.path.join(args.log_dir, "activation_histograms"), args,
                class_names=classes)
        except Exception as e:
            print(f"(activation histograms skipped: {e})", flush=True)
        # Saliency attribution (IDG) on sampled projection-set images —
        # the reference ships this as the separate interpret_idg script
        # (reference util/interpret_idg.py:207); one flag = full suite.
        try:
            from ..interpret.interpret_idg import interpret as run_idg
            run_idg({
                "run_dir": args.log_dir,
                "images_per_class": getattr(
                    args, "interpret_images_per_class", 1),
                "method": getattr(args, "interpret_method", "IDG"),
            })
        except Exception as e:
            print(f"(saliency attribution skipped: {e})", flush=True)
        # CUB part purity — only when the part annotations are on disk
        # (reference util/eval_cub_csv.py:16-176).
        try:
            cub_root = "data/CUB_200_2011"
            parts_loc = os.path.join(cub_root, "parts", "part_locs.txt")
            parts_name = os.path.join(cub_root, "parts", "parts.txt")
            imgs_id = os.path.join(cub_root, "images.txt")
            if (str(getattr(args, "dataset", "")).startswith("CUB")
                    and all(os.path.exists(p) for p in
                            (parts_loc, parts_name, imgs_id))):
                from ..interpret.eval_cub_csv import (
                    get_topk_cub, eval_prototypes_cub_parts_csv,
                )
                csvfile = get_topk_cub(trainer, projectloader, 10,
                                       "best", args)
                eval_prototypes_cub_parts_csv(
                    csvfile, parts_loc, parts_name, imgs_id, "best",
                    args, log)
        except Exception as e:
            print(f"(CUB part purity skipped: {e})", flush=True)

    print("Done!", flush=True)
    return trainer
