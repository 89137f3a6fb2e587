"""Checkpointing: layered saves, resume, and the metrics-JSON contract.

Mirrors the reference's redundant checkpoint layering (SURVEY §5.3/5.4):
  * ``metrics_latest.ckpt``      — full train state + metrics, every quick-val
  * ``model_best.ckpt``          — params only, on quick-val PSNR improvement
  * ``model_{step}.ckpt``        — params only, every ckpt_interval
  * ``model_final.ckpt``         — params at the end
  * ``metrics_latest.json`` / ``metrics_{step}_latest.json`` — the JSON
    schema of scripts/train.py:457-467 (train_losses, train_psnrs,
    quick_val_*, val_steps, iteration_times, best_val_psnr), so the
    plotting/status tools carry over unchanged.

Format: flax msgpack serialization of the pytree; ``load_checkpoint``
restores into a template pytree of matching structure (``load_params_any``
inspects the serialized structure to pick the right template). Official TF
``.npy`` weight lists remain an import path via models/import_tf.py (the
PSNR-parity bootstrap).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


class CheckpointCorruptError(Exception):
    """The file exists but cannot be decoded (truncated/corrupt msgpack).

    Distinct from a structure/shape mismatch (which raises through
    ``from_state_dict``): corruption is recoverable by starting fresh,
    an architecture mismatch is a user error that must fail loudly —
    silently discarding a resumable run would overwrite its checkpoints."""


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialize any pytree (params or full TrainState-as-dict).

    Atomic (tmp + rename): a crash mid-write must not leave a truncated
    metrics_latest.ckpt that bricks auto-resume (these files are written
    every quick-val and can be hundreds of MB)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = jax.device_get(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template pytree of matching structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_metrics_json(path: str, metrics_state: Dict) -> None:
    """Atomic write (tmp + rename): live monitors poll this file while
    training writes it (scripts/plot_training_progress.py --live)."""
    from nerfmlp_tpu.train.metrics import convert_for_json

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(convert_for_json(metrics_state), f, indent=2)
    os.replace(tmp, path)


def load_metrics_json(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def save_params_npy(path: str, params: Dict, cfg=None) -> None:
    """Export params as an official-order .npy object array
    (round-trips with example/run_nerf.py:835-839-style checkpoints)."""
    from nerfmlp_tpu.models.import_tf import params_to_numpy

    arrays = params_to_numpy(jax.device_get(params), cfg)
    obj = np.empty(len(arrays), dtype=object)
    for i, a in enumerate(arrays):
        obj[i] = a
    np.save(path, obj)


def load_params_any(path: str, template_params: Optional[Dict] = None, cfg=None,
                    with_step: bool = False):
    """Load params from a .npy official weight list, a torch reference
    ``.pth`` checkpoint, or a .ckpt msgpack file — the superset of
    render_example.py:166-207's dual loading.

    Returns the renderer-shaped dict ``{"coarse": ..., ["fine": ...]}``
    regardless of whether the file stored bare model params or the full
    coarse/fine dict (``.npy``/``.pth`` checkpoints are always one
    network — the reference shares it for coarse+fine, renderer.py:76).

    ``with_step=True`` returns ``(params, step)`` instead, with the step
    taken from the filename or — for a full-TrainState ``.ckpt`` — from
    the state itself, in the SAME decode (serving's hot reload wants both
    without msgpack-parsing a multi-MB file twice)."""
    step = step_from_filename(path)
    if path.endswith(".npy"):
        from nerfmlp_tpu.models.import_tf import load_npy_weights, params_from_numpy

        p = {"coarse": params_from_numpy(load_npy_weights(path), cfg)}
        return (p, step) if with_step else p
    if path.endswith(".pth") or path.endswith(".pt"):
        from nerfmlp_tpu.models.import_torch import load_pth

        p = {"coarse": load_pth(path, cfg)}
        return (p, step) if with_step else p
    if template_params is None:
        raise ValueError(".ckpt loading requires a template param pytree")
    if "coarse" in template_params:
        # A dict template may carry a distinct fine-net template (custom
        # --netdepth_fine/--netwidth_fine architectures); otherwise the
        # fine net shares the coarse structure (the oracle's default).
        coarse_t = template_params["coarse"]
        fine_t = template_params.get("fine", coarse_t)
    else:
        coarse_t = fine_t = template_params
    # Inspect the serialized structure FIRST: flax restore ignores extra
    # keys, so naively trying templates in order would silently DROP the
    # fine network from a separate-fine checkpoint.
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "opt_state" in raw:
        # A full TrainState (metrics_latest.ckpt — the file auto-resume
        # prefers): extract its params so every render/eval CLI can point
        # at it directly (optimizer moments are irrelevant to rendering).
        if not step and "step" in raw:
            try:
                step = int(np.asarray(raw["step"]))
            except (TypeError, ValueError):
                pass
        raw = raw["params"]
    if "coarse" in raw:  # {"coarse": ..., ["fine": ...]}
        template = {
            k: (fine_t if k == "fine" else coarse_t) for k in raw.keys()
        }
        p = serialization.from_state_dict(template, raw)
    else:
        p = {"coarse": serialization.from_state_dict(coarse_t, raw)}
    return (p, step) if with_step else p


def load_state_or_params(path: str, template_state: Any):
    """Single-decode restore: ``(TrainState, False)`` when the file holds a
    full train state, ``(params, True)`` for a bare params checkpoint —
    one msgpack parse per resume of a multi-hundred-MB state (a separate
    kind-probe helper would decode it twice).

    Raises :class:`CheckpointCorruptError` when the bytes cannot be
    decoded; template mismatches propagate as flax's own errors."""
    try:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
    except Exception as e:
        raise CheckpointCorruptError(f"cannot decode {path}: {e}") from e
    if not isinstance(raw, dict):
        raise CheckpointCorruptError(
            f"{path} decoded to {type(raw).__name__}, expected a dict"
        )
    template = template_state if "opt_state" in raw else template_state.params
    # flax restore ignores EXTRA state keys (a deeper checkpoint silently
    # loses layers into a shallower template) and never checks leaf SHAPES
    # (wrong --netwidth restores garbage that fails far away, if at all).
    # Compare the serialized structures explicitly so architecture
    # mismatches fail HERE, loudly.
    want = serialization.to_state_dict(jax.device_get(template))
    flat_raw = dict(_flatten_state_dict(raw))
    flat_want = dict(_flatten_state_dict(want))
    extra = sorted(set(flat_raw) - set(flat_want))
    missingk = sorted(set(flat_want) - set(flat_raw))
    if extra or missingk:
        raise ValueError(
            f"{path}: checkpoint structure does not match this architecture "
            f"(checkpoint-only keys: {extra[:4]}, template-only keys: "
            f"{missingk[:4]}) — pass the run's original "
            f"--netdepth/--netwidth/--separate_fine flags"
        )
    for key, a in flat_raw.items():
        b = flat_want[key]
        if (
            hasattr(a, "shape") and hasattr(b, "shape")
            and np.shape(a) != np.shape(b)
        ):
            raise ValueError(
                f"{path}: checkpoint leaf {key} has shape {np.shape(a)}, "
                f"this architecture expects {np.shape(b)} — pass the run's "
                f"original --netdepth/--netwidth flags"
            )
    if "opt_state" in raw:
        return serialization.from_state_dict(template_state, raw), False
    return serialization.from_state_dict(template_state.params, raw), True


def _flatten_state_dict(d: Any, prefix: str = ""):
    """Yield (dotted-path, leaf) pairs from a nested state dict."""
    if isinstance(d, dict):
        for k, v in d.items():
            yield from _flatten_state_dict(v, f"{prefix}{k}/")
    else:
        yield prefix.rstrip("/"), d


def step_from_filename(path: str) -> int:
    """model_{step}.ckpt / model_{step}_latest.ckpt -> step; 0 when the
    name carries no step."""
    stem = os.path.basename(path)
    for prefix, suffix in (("model_", "_latest.ckpt"), ("model_", ".ckpt")):
        if stem.startswith(prefix) and stem.endswith(suffix):
            digits = stem[len(prefix) : -len(suffix)]
            if digits.isdigit():
                return int(digits)
    return 0


def step_in_checkpoint(path: str) -> int:
    """Step recorded INSIDE a full-TrainState ``.ckpt``; 0 otherwise.

    ``metrics_latest.ckpt`` carries no step in its NAME but stores the
    true one in its state — serving's /health uses this so the fallback
    checkpoint never reports step 0 for a later-step state."""
    if not path or not path.endswith(".ckpt") or not os.path.exists(path):
        return 0
    try:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
    except Exception:
        return 0
    if isinstance(raw, dict) and "opt_state" in raw and "step" in raw:
        try:
            return int(np.asarray(raw["step"]))
        except (TypeError, ValueError):
            return 0
    return 0


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Auto-discover the most recent resumable checkpoint in a directory
    (the TF oracle auto-reloads sorted model_*.npy, run_nerf.py:439-456)."""
    if not os.path.isdir(save_dir):
        return None
    cand = os.path.join(save_dir, "metrics_latest.ckpt")
    if os.path.exists(cand):
        return cand
    best = (None, 0)
    for name in os.listdir(save_dir):
        if name.startswith("model_") and name.endswith(".ckpt"):
            step = step_from_filename(name)
            # step > 0 only: model_best/model_final carry no step —
            # auto-resuming them would silently renumber a finished run
            # from 0 (explicit --resume still accepts them, loudly).
            if step > best[1]:
                best = (name, step)
    if best[0] is not None:
        return os.path.join(save_dir, best[0])
    return None
