"""Checkpointing with the reference's three roles and config-hash discovery.

Reference: util/checkpoint_manager.py (CheckpointManager) and
util/selective_loading.py (backbone-only loading). Capabilities:

* roles: ``net_pretrained`` (after phase 1), rolling ``net_trained`` +
  ``net_trained_last``, and ``net_best`` keyed on stored accuracy;
* md5 config hash over pretraining-relevant hyperparameters for
  auto-discovery of compatible pretrained checkpoints
  (checkpoint_manager.py:17-33, main.py:27-40);
* search order: ``pretrained_checkpoints_dir/checkpoints`` then
  ``log_dir/checkpoints`` (checkpoint_manager.py:35-41);
* resume: restore params + both optimizer states + epoch
  (checkpoint_manager.py:193-249);
* backbone-only selective loading across architectures, skipping
  shape mismatches (selective_loading.py:14-162).

Format: flax msgpack of the state pytree + a JSON sidecar with epoch /
accuracy / config hash (a single-file checkpoint like the reference's
torch.save dicts, no orbax directory trees to rsync around).
"""

import hashlib
import json
import os
import shutil
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

__all__ = ["CheckpointManager", "load_backbone_only", "config_hash"]


def config_hash(args) -> str:
    """md5 over pretraining-relevant params (reference main.py:27-40)."""
    pretraining_params = {
        "max_count": getattr(args, "max_count", 3),
        "use_mid_layers": getattr(args, "use_mid_layers", False),
        "num_stages": getattr(args, "num_stages", 2),
        "num_features": args.num_features,
        "activation": getattr(args, "activation", "gumbel_softmax"),
        "net": args.net,
        "dataset": args.dataset,
    }
    param_str = json.dumps(pretraining_params, sort_keys=True)
    return hashlib.md5(param_str.encode()).hexdigest()[:10]


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _save_file(path: str, tree: Dict[str, Any], meta: Dict[str, Any]):
    # Atomic write (tmp + rename): a concurrent reader — e.g. a non-main
    # process in a multi-host run reaching the best-model reload while
    # process 0 is still saving — never sees a truncated file.
    blob = serialization.msgpack_serialize(_to_numpy(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    with open(path + ".json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(path + ".json.tmp", path + ".json")


def _load_meta(path: str):
    """Read a checkpoint's .json sidecar; None if absent/corrupt."""
    try:
        with open(path + ".json") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _graft(target, saved):
    """Partial restore: copy saved leaves onto the target tree wherever
    the path exists in both and shapes match; keep the target's fresh
    init elsewhere. The selective-loading semantic the reference uses for
    shared pretrained backbones (util/selective_loading.py:35-162) — e.g.
    an onehot-pretrained checkpoint (parameterless intermediate) loading
    into a linear/bilinear model whose intermediate stays fresh-init.

    Returns (tree, loaded_count, skipped_count)."""
    loaded = skipped = 0

    def count_leaves(v):
        return len(_flatten(v)) if isinstance(v, dict) else 1

    def rec(t, s):
        nonlocal loaded, skipped
        if isinstance(t, dict):
            if not isinstance(s, dict):
                skipped += count_leaves(t)
                return t
            out = {}
            for k, v in t.items():
                if k in s:
                    out[k] = rec(v, s[k])
                else:
                    skipped += count_leaves(v)
                    out[k] = v
            return out
        # leaf: accept only shape-compatible array leaves; cast to the
        # target dtype so a partial restore can never silently change a
        # parameter's compute dtype (e.g. f32 saved leaf into a bf16 tree)
        if hasattr(s, "shape") and getattr(t, "shape", None) == s.shape:
            loaded += 1
            t_dtype = getattr(t, "dtype", None)
            if t_dtype is not None and getattr(s, "dtype", None) != t_dtype:
                s = np.asarray(s, dtype=t_dtype)
            return s
        skipped += 1
        return t

    return rec(target, saved), loaded, skipped


def _load_file(path: str, target=None, partial: bool = False):
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    if target is not None:
        if partial:
            # Always graft leaf-wise: ``from_state_dict`` only checks tree
            # STRUCTURE, so an onehot checkpoint (head (K, P*max_count))
            # restores "successfully" into an identity-intermediate model
            # (head (K, P) — identical structure, different shape) and the
            # mismatch only explodes later inside model.apply.
            saved = tree
            tree, loaded, skipped = _graft(target, saved)
            if skipped:
                print(f"Partial checkpoint restore: {loaded} leaves "
                      f"loaded, {skipped} kept at fresh init "
                      f"(tree/shape mismatch — e.g. different "
                      f"intermediate layer)", flush=True)
        else:
            tree = serialization.from_state_dict(target, tree)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return tree, meta


class CheckpointManager:
    """Three checkpoint roles + hash discovery, functional-state edition.

    A checkpoint stores ``{"params", "batch_stats", "opt_state"}`` (the
    TPU-native analogue of the reference's model_state_dict +
    optimizer_net/classifier state dicts) plus epoch/accuracy metadata.
    """

    def __init__(self, args):
        self.args = args
        self.hash = config_hash(args)
        self.log_ckpt_dir = os.path.join(args.log_dir, "checkpoints")
        os.makedirs(self.log_ckpt_dir, exist_ok=True)
        self.search_dirs = []
        if getattr(args, "pretrained_checkpoints_dir", ""):
            self.search_dirs.append(
                os.path.join(args.pretrained_checkpoints_dir, "checkpoints"))
        self.search_dirs.append(self.log_ckpt_dir)
        # Seed best-accuracy tracking from an existing net_best sidecar:
        # a resumed/chunked process must not clobber the true best with
        # its own first (worse) epoch. The reference tracks best only
        # in-process and has the same clobbering on resume
        # (checkpoint_manager.py:251-308); here resume is first-class.
        # Only when actually resuming — a FRESH run reusing a log_dir
        # must be able to save its own best (and reload it at the end),
        # like the reference, rather than being pinned under a stale
        # sidecar from a previous run.
        self.best_accuracy = -1.0
        if getattr(args, "resume_training", False):
            meta = _load_meta(os.path.join(self.log_ckpt_dir, "net_best"))
            if meta and "accuracy" in meta:
                self.best_accuracy = float(meta["accuracy"])

    # -- save ---------------------------------------------------------------
    def _state(self, params, batch_stats=None, opt_state=None):
        return {
            "params": params,
            "batch_stats": batch_stats if batch_stats is not None else {},
            "opt_state": opt_state if opt_state is not None else {},
        }

    def save_pretrained_checkpoint(self, params, batch_stats=None,
                                   opt_state=None):
        """net_pretrained + a hash-named copy
        (checkpoint_manager.py:98-147)."""
        state = self._state(params, batch_stats, opt_state)
        meta = {"config_hash": self.hash}
        _save_file(os.path.join(self.log_ckpt_dir, "net_pretrained"),
                   state, meta)
        _save_file(
            os.path.join(self.log_ckpt_dir, f"net_pretrained_{self.hash}"),
            state, meta)

    def save_trained_checkpoint(self, params, batch_stats, opt_state, epoch,
                                tau=None):
        """Rolling net_trained + net_trained_last
        (checkpoint_manager.py:149-191). Serialized once; the second
        role is a file copy (the msgpack of a flagship-size tree is
        ~320 MB — serializing it twice per epoch measurably slows
        checkpoint-heavy runs on a 1-core host).

        ``tau``: current Gumbel temperature, stored in the metadata so a
        resumed run continues at the annealed value. The reference loses
        tau on resume (it is a plain module attribute, not in
        state_dict — count_pipnet_utils.py:13-21) so a resumed torch run
        silently restarts at tau=1.0; with chunked training first-class
        here, resume must not change the trajectory."""
        state = self._state(params, batch_stats, opt_state)
        meta = {"epoch": epoch if isinstance(epoch, int) else str(epoch),
                "config_hash": self.hash}
        if tau is not None:
            meta["tau"] = float(tau)
        first = os.path.join(self.log_ckpt_dir, "net_trained")
        _save_file(first, state, meta)
        second = os.path.join(self.log_ckpt_dir, "net_trained_last")
        tmp = second + ".tmp"
        shutil.copyfile(first, tmp)
        os.replace(tmp, second)
        shutil.copyfile(first + ".json", second + ".json.tmp")
        os.replace(second + ".json.tmp", second + ".json")

    def save_best_checkpoint(self, params, batch_stats, opt_state, epoch,
                             accuracy):
        """Keep net_best when accuracy improves
        (checkpoint_manager.py:251-308)."""
        if accuracy <= self.best_accuracy:
            return False
        self.best_accuracy = float(accuracy)
        state = self._state(params, batch_stats, opt_state)
        meta = {"epoch": epoch, "accuracy": float(accuracy),
                "config_hash": self.hash}
        _save_file(os.path.join(self.log_ckpt_dir, "net_best"), state, meta)
        return True

    # -- load ---------------------------------------------------------------
    def _find(self, names, own_first: bool = False):
        """Search the checkpoint dirs for the first existing name.

        ``own_first``: prefer the run's OWN log_dir/checkpoints over the
        shared ``pretrained_checkpoints_dir``. The reference searches the
        shared dir first for every role (checkpoint_manager.py:35-41),
        but its shared dirs hold only ``net_pretrained``; ours may be a
        full donor run dir whose ``net_best``/``net_trained_last`` would
        shadow this run's own (a different model variant entirely).
        """
        dirs = self.search_dirs
        if own_first:
            dirs = list(reversed(dirs))
        for d in dirs:
            for name in names:
                path = os.path.join(d, name)
                if os.path.exists(path):
                    return path
        return None

    def load_pretrained_checkpoint(self, target_state=None):
        """Explicit --state_dict_dir_net path, else hash-matched discovery
        (checkpoint_manager.py:50-96). Returns (state, meta) or None."""
        explicit = getattr(self.args, "state_dict_dir_net", "")
        if explicit:
            path = explicit if os.path.isfile(explicit) else self._find(
                [os.path.basename(explicit)])
            if explicit and os.path.isdir(explicit):
                cand = os.path.join(explicit, "net_pretrained")
                path = cand if os.path.exists(cand) else None
            if path:
                print(f"Loading pretrained checkpoint: {path}", flush=True)
                return _load_file(path, target_state, partial=True)
            return None
        path = self._find([f"net_pretrained_{self.hash}"])
        if path:
            print(f"Found hash-matched pretrained checkpoint: {path}",
                  flush=True)
            return _load_file(path, target_state, partial=True)
        return None

    def load_trained_checkpoint(self, target_state=None,
                                name="net_trained_last"):
        path = self._find([name], own_first=True)
        if path is None:
            return None
        print(f"Resuming from checkpoint: {path}", flush=True)
        return _load_file(path, target_state)

    def load_best_checkpoint(self, target_state=None):
        path = self._find(["net_best"], own_first=True)
        if path is None:
            return None
        return _load_file(path, target_state)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def load_backbone_only(checkpoint_path: str, params,
                       scopes=("backbone", "add_on"), verbose=True):
    """Load only backbone (+ add-on) params from any checkpoint, skipping
    shape mismatches — cross-architecture backbone sharing
    (reference util/selective_loading.py:14-162, wired at main.py:124-141).

    Returns (new_params, info dict with loaded/total counts).
    """
    raw, _meta = _load_file(checkpoint_path)
    src_params = raw.get("params", raw)

    flat_src = _flatten(src_params)
    flat_dst = _flatten(params)
    loaded, total = 0, 0
    new_flat = dict(flat_dst)
    for key, dst_leaf in flat_dst.items():
        if key[0] not in scopes:
            continue
        total += 1
        src_leaf = flat_src.get(key)
        if src_leaf is None:
            continue
        if tuple(np.shape(src_leaf)) != tuple(np.shape(dst_leaf)):
            if verbose:
                print(f"skip (shape mismatch): {'/'.join(key)} "
                      f"{np.shape(src_leaf)} vs {np.shape(dst_leaf)}")
            continue
        new_flat[key] = np.asarray(src_leaf)
        loaded += 1

    def unflatten(flat):
        root: Dict[str, Any] = {}
        for key, v in flat.items():
            node = root
            for k in key[:-1]:
                node = node.setdefault(k, {})
            node[key[-1]] = v
        return root

    if verbose:
        print(f"Loaded {loaded}/{total} backbone parameters from "
              f"{checkpoint_path}")
    return unflatten(new_flat), {"success": loaded > 0,
                                 "loaded_params": loaded,
                                 "total_backbone_params": total}


def find_shared_backbone(directory: str):
    """Search a directory for candidate checkpoints, preferring pretrained
    (reference selective_loading.py:164-200)."""
    candidates = []
    for sub in ("checkpoints", "."):
        d = os.path.join(directory, sub)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.endswith(".json"):
                continue
            if name.startswith("net_pretrained"):
                candidates.insert(0, os.path.join(d, name))
            elif name.startswith("net_"):
                candidates.append(os.path.join(d, name))
    return candidates[0] if candidates else None
