"""Configuration system: argparse flags + YAML overlay + run-dir persistence.

Contract parity with the reference (util/args.py:14-248):
* the same ~35 flag names and defaults;
* ``--config <yaml>`` sets parser *defaults* so explicit CLI flags still win;
* unknown YAML keys print a warning;
* ``save_args`` writes ``args.txt`` (quoted strings) and a pickle.

TPU additions: ``--dtype`` (bf16/fp32 compute), ``--mesh_shape`` (data
parallel device count, -1 = all local devices), ``--profile_dir`` (jax
profiler traces, SURVEY.md §5 calls for first-class step timing).
"""

import argparse
import os
import pickle

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

__all__ = ["build_parser", "get_args", "save_args", "args_from_yaml",
           "DEFAULTS"]


def _bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Train a PIP-Net / Count-PIPNet (TPU)")
    add = p.add_argument
    add("--config", type=str, default="", help="Path to YAML config file")
    add("--dataset", type=str, default="CUB-200-2011")
    add("--validation_size", type=float, default=0.0,
        help="train/val split fraction when no test dir exists")
    add("--net", type=str, default="convnext_tiny_26",
        help="backbone: convnext_tiny_26/13, resnet18/34/50/50_inat/101/152")
    add("--batch_size", type=int, default=64)
    add("--batch_size_pretrain", type=int, default=128)
    add("--epochs", type=int, default=60)
    add("--epochs_pretrain", type=int, default=10)
    add("--epochs_finetune", type=int, default=20)
    add("--optimizer", type=str, default="Adam")
    add("--lr", type=float, default=0.05,
        help="classifier learning rate")
    add("--tanh_loss_coeff", type=float, default=1.0)
    add("--lr_block", type=float, default=0.0005)
    add("--lr_net", type=float, default=0.0005)
    add("--weight_decay", type=float, default=0.0)
    add("--disable_cuda", action="store_true",
        help="kept for CLI parity; selects CPU over accelerator")
    add("--log_dir", type=str, default="./runs/run_pipnet")
    add("--num_features", type=int, default=0,
        help="number of prototypes; 0 = backbone channel count")
    add("--image_size", type=int, default=224)
    add("--state_dict_dir_net", type=str, default="",
        help="directory containing a pretrained checkpoint")
    add("--freeze_epochs", type=int, default=10)
    add("--dir_for_saving_images", type=str, default="visualization_results")
    add("--disable_pretrained", action="store_true")
    add("--weighted_loss", action="store_true")
    add("--seed", type=int, default=1)
    add("--gpu_ids", type=str, default="",
        help="kept for CLI parity; device selection is mesh-based on TPU")
    add("--num_workers", type=int, default=8)
    add("--bias", action="store_true")
    add("--extra_test_image_folder", type=str, default="./experiments")
    add("--pretrained_checkpoints_dir", type=str, default="")
    add("--shared_pretrained_dir", type=str, default="")
    add("--resume_training", action="store_true")
    # Count-PIPNet flags
    add("--model", type=str, default="pipnet",
        help='"pipnet" or "count_pipnet"')
    add("--use_mid_layers", action="store_true")
    add("--num_stages", type=int, default=3)
    add("--max_count", type=int, default=3)
    add("--use_ste", type=_bool, choices=[True, False], default=False)
    add("--activation", type=str, default="gumbel_softmax",
        help="softmax or gumbel_softmax")
    add("--intermediate_layer", type=str, default="onehot",
        help="onehot | linear | linear_full | bilinear | identity")
    add("--train_intermediate", type=_bool, choices=[True, False],
        default=True)
    add("--enforce_weight_sparsity", type=_bool, choices=[True, False],
        default=True)
    add("--positive_grad_strategy", type=str, default=None,
        choices=[None, "current_grad", "max_grad"])
    add("--backward_clamp_strategy", type=str, default="Identity",
        choices=["Identity", "Gated"])
    # TPU-native additions
    add("--unfreeze_warmup_epochs", type=int, default=0,
        help="ramp the lower-backbone LR linearly from 0 over this many "
             "epochs after the freeze_epochs unfreeze boundary (0 = the "
             "reference's instant unfreeze). Stabilization lever for "
             "random-init flagship runs: the full unfreeze collapses "
             "training when the early stages are not ImageNet-pretrained "
             "(analysis/flagship_200_canon/)")
    add("--pipeline_depth", type=int, default=2,
        help="max in-flight train-step dispatches before the host "
             "blocks on the oldest step's metrics (0 = fetch every "
             "step synchronously, the pre-round-4 behavior). Depth 2 "
             "overlaps host decode/feed with device compute like the "
             "reference's CUDA-stream + DataLoader-worker pipeline")
    add("--device_augment", action="store_true",
        help="run the photometric two-view augmentation (color jitter + "
             "crop + noise + normalize) on device instead of host CPU; "
             "supported for the synthetic shapes/mnist recipes")
    add("--device_geometric", action="store_true",
        help="with --device_augment on a shapes recipe, also run the "
             "SHARED geometric transform1 (RandomRotation + "
             "RandomResizedCrop) on device as one bilinear resample of "
             "the host's Resize(img+32) canvas; ~10x less host CPU per "
             "image (distributional parity with the host chain, not "
             "pixel parity)")
    add("--cache_decoded", action="store_true",
        help="memoize decoded training/eval images in host RAM (skips "
             "PNG/JPEG decode after the first epoch; ~1.5 GB at 10k "
             "224^2 images — for the synthetic datasets, not CUB-scale "
             "native-resolution photos)")
    add("--decode_cache_dir", type=str, default="",
        help="with --cache_decoded: persist the decoded images as one "
             "fingerprinted memory-mapped .npy per image folder in this "
             "directory. Chunk restarts (scripts/train_chunked.py) and "
             "repeat runs skip the decode pass entirely, and the "
             "read-only mmap replaces the per-process RAM copy. "
             "Uniform image sizes required (synthetic datasets); "
             "falls back to the RAM cache otherwise")
    add("--fused_whole_blocks", action="store_true",
        help="run ENTIRE ConvNeXt blocks (dwconv included) through the "
             "whole-block Pallas kernel with an XLA-recompute backward; "
             "supersedes --fused_blocks when both are set. Same param "
             "tree — checkpoints interchange")
    add("--fused_blocks", action="store_true",
        help="run ConvNeXt block bodies through the differentiable fused "
             "Pallas kernel (tanh-approx GELU; Pallas forward + "
             "remat-style backward). Same param tree as the standard "
             "path — checkpoints interchange")
    add("--max_epochs_per_process", type=int, default=0,
        help="exit with a resumable checkpoint after this many main "
             "epochs in one process (0 = unlimited). Works around the "
             "remote TPU client's per-dispatch host-memory leak "
             "(~2.8 GB/epoch at the flagship shape — a 60-epoch run "
             "gets OOM-killed; BENCH_NOTES.md). scripts/train_chunked.py "
             "re-invokes with --resume_training until done")
    add("--no_phase_dce", action="store_true",
        help="disable per-phase static freezing of the compiled train "
             "step. By default the trainer compiles one step per distinct "
             "frozen-label set (pretrain / finetune / freeze / unfrozen) "
             "with stop_gradient baked in, so XLA dead-codes the backward "
             "of frozen param groups — torch requires_grad semantics "
             "(reference main.py:238-253,333-390). Disabling keeps the "
             "single runtime-masked step (one compile, slower frozen "
             "phases)")
    add("--fused_dwconv", action="store_true",
        help="run the block-opening depthwise conv FORWARD through the "
             "channels-to-lanes Pallas kernel, keeping XLA's conv vjp for "
             "both gradients (the conv is linear, so gradients are "
             "bit-identical to nn.Conv's). Composes with --fused_blocks; "
             "same param tree — checkpoints interchange")
    add("--viz_topk", type=_bool, choices=[True, False], default=True,
        help="save per-prototype top-k patch PNGs during the best-model "
             "visualization (reference vis_pipnet plot_topk)")
    add("--viz_prototype_maps", type=_bool, choices=[True, False],
        default=True,
        help="render rich prototype feature-map artifacts (original + "
             "rect, side-by-side heatmap, masked overlay, debug txt) for "
             "the best model (reference util/vis_pipnet.py:354-486, "
             ":888-1032)")
    add("--viz_histograms", type=_bool, choices=[True, False],
        default=False,
        help="plot per-class prototype activation histograms during the "
             "best-model visualization")
    add("--interpret", action="store_true",
        help="after training, run the interpretability suite on the "
             "finished run: prediction explanations (vis_pred) and "
             "activation histograms; saliency attribution stays available "
             "via count_pipnet_tpu.interpret.interpret_idg")
    add("--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float32"], help="compute dtype")
    add("--mesh_shape", type=int, default=-1,
        help="data-parallel mesh size; -1 = all local devices")
    add("--profile_dir", type=str, default="",
        help="when set, capture jax.profiler traces into this dir")
    return p


DEFAULTS = {a.dest: a.default for a in build_parser()._actions
            if a.dest != "help"}


def _apply_yaml_defaults(parser, config_path):
    if yaml is None:
        raise RuntimeError("pyyaml is unavailable; cannot read --config")
    with open(config_path) as f:
        config = yaml.safe_load(f) or {}
    known = {a.dest for a in parser._actions if a.dest != "help"}
    updates = {}
    for key, value in config.items():
        if key in known:
            updates[key] = value
        else:
            print(f"Warning: Config contains unknown parameter '{key}'")
    if updates:
        parser.set_defaults(**updates)
    return parser


def get_args(argv=None) -> argparse.Namespace:
    """Parse CLI args; a --config YAML file supplies defaults only
    (explicit CLI flags take precedence, reference util/args.py:194-220)."""
    parser = build_parser()
    known, _ = parser.parse_known_args(argv)
    if known.config and os.path.exists(known.config):
        print("Using the config parameters as default. Command-line "
              "arguments still take precedence.")
        _apply_yaml_defaults(parser, known.config)
    args = parser.parse_args(argv)
    if len(args.log_dir.split("/")) > 2 and not os.path.exists(args.log_dir):
        os.makedirs(args.log_dir, exist_ok=True)
    return args


def args_from_yaml(config_path, **overrides) -> argparse.Namespace:
    """Build a namespace straight from a YAML file plus overrides — the
    sweep-runner path (reference run_multiple_configs.py:121-179)."""
    parser = build_parser()
    _apply_yaml_defaults(parser, config_path)
    args = parser.parse_args([])
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def save_args(args, directory_path) -> None:
    """Persist args as args.txt (readable) + args.pickle (reusable).
    Reference: util/args.py:228-248."""
    os.makedirs(directory_path, exist_ok=True)
    with open(os.path.join(directory_path, "args.txt"), "w") as f:
        for arg in vars(args):
            val = getattr(args, arg)
            if isinstance(val, str):
                val = f"'{val}'"
            f.write(f"{arg}: {val}\n")
    with open(os.path.join(directory_path, "args.pickle"), "wb") as f:
        pickle.dump(args, f)
