"""Checkpoint I/O: diffusers-style layout, safetensors, torch-weight import.

Mirrors the reference's on-disk contract (SURVEY §5.4) the inference layer
auto-discovers:

  outputs/models/{task}/best/        — best-by-val-PSNR full pipeline
  outputs/models/{task}/final/       — end-of-training pipeline
  outputs/models/{task}/checkpoint-{step}/ — periodic UNet-only checkpoints

(reference: train_denoising.py:724-786, :837-911; discovery
src/inference.py:93-137). Formats:

- Model params: flattened-safetensors per component
  (`unet/model.safetensors`, ...) + `config.json` — fully portable,
  torch-free.
- Training state (params + optimizer + step): Orbax, for fast async
  TPU-native checkpointing and true resume (the reference loses optimizer
  state on resume — train_denoising.py:194-202 reloads weights only).
- One-time import of Hugging Face torch checkpoints (SD1.5 / SD-inpaint):
  name-mapped, layout-transposed (OIHW->HWIO convs, transposed Dense
  kernels) from the diffusers/transformers state dicts.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from safetensors import numpy as st_numpy
except ImportError:  # pragma: no cover
    st_numpy = None

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Pytree <-> flat dict
# ---------------------------------------------------------------------------


def flatten_params(tree, sep: str = "/") -> Dict[str, np.ndarray]:
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{sep}{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", tree)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray], sep: str = "/"):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


# ---------------------------------------------------------------------------
# safetensors save/load
# ---------------------------------------------------------------------------


def fetch_params_verified(params, max_retries: int = 3):
    """Fetch a (possibly device-resident) params pytree to host numpy,
    verified against device-side checksums.

    Defense-in-depth for checkpoint saves. The actual round-2..4 silent
    checkpoint corruption turned out to be the safetensors non-contiguity
    bug fixed in save_params (see there), not a bad device fetch — but the
    hunt showed the save path had NO verification anywhere, and the relay
    platform is explicitly experimental. So every save now:

      1. computes per-leaf |x| sums ON DEVICE (one tiny jit, scalar fetch),
      2. fetches the tree (one materializing np.array copy per leaf) and
         compares host sums against the device sums,
      3. refetches any mismatching leaf through a fresh buffer (x + 0
         allocates a new output buffer), and
      4. raises RuntimeError if the mismatch survives `max_retries`,
         so a corrupt checkpoint can never be written silently.

    Host-resident (numpy / CPU-backend) trees take a fast path with no
    device work. Set IRET_NO_VERIFY_FETCH=1 to disable (debug only).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    needs_verify = os.environ.get("IRET_NO_VERIFY_FETCH") != "1" and (
        os.environ.get("IRET_FORCE_VERIFY_FETCH") == "1"
        or any(
            isinstance(l, jax.Array)
            and next(iter(l.devices())).platform != "cpu"
            for l in leaves
        )
    )
    if not needs_verify:
        return jax.tree_util.tree_unflatten(
            treedef, [np.asarray(l) for l in leaves]
        )

    # np.array(copy=True): one materializing read per leaf; the copy is
    # plain host memory, so verification and serialization read the same
    # bytes. (np.asarray of a fetched TPU array can be a non-C-contiguous
    # view in device layout — save_params normalizes before writing.)
    # test seam: _fetch simulates a corrupted fetch in unit tests
    _fetch = getattr(
        fetch_params_verified, "_fetch", lambda x: np.array(x, copy=True)
    )

    def _sums(ls):
        return [jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))) for x in ls]

    dev_sums = np.asarray(jax.device_get(jax.jit(_sums)(leaves)), np.float64)
    host = [_fetch(l) for l in leaves]

    def _bad_indices():
        bad = []
        for i, h in enumerate(host):
            hsum = float(np.abs(np.asarray(h, np.float64)).sum())
            ref = float(dev_sums[i])
            if not np.isclose(hsum, ref, rtol=1e-3, atol=1e-3):
                bad.append(i)
        return bad

    bad = _bad_indices()
    for attempt in range(max_retries):
        if not bad:
            break
        logger.warning(
            "verified fetch: %d/%d leaves mismatch device checksums "
            "(stale relay buffers?) — refetching via fresh buffers "
            "(attempt %d)", len(bad), len(leaves), attempt + 1,
        )
        fresh = jax.jit(lambda ls: [x + jnp.zeros((), x.dtype) for x in ls])(
            [jnp.asarray(leaves[i]) for i in bad]
        )
        for j, i in enumerate(bad):
            host[i] = _fetch(fresh[j])
        bad = _bad_indices()
    if bad:
        raise RuntimeError(
            f"checkpoint fetch corrupt after {max_retries} retries: "
            f"{len(bad)} leaves disagree with device checksums "
            f"(first: index {bad[0]}, shape {host[bad[0]].shape})"
        )
    return jax.tree_util.tree_unflatten(treedef, host)


class ParamExporter:
    """Pre-compiled device->host export with trusted verification.

    The trainers' save-time fetch path: pre-compiles, per tree structure,
      - an identity export (outputs = fresh buffers), and
      - a per-leaf |x|-sum reduction (trusted scalar reference),
    and `fetch()` retries the export until the host copy matches the
    reference sums, raising rather than returning silent garbage.
    Compiling at trainer start (prepare()) keeps the multi-minute remote
    compile of the 860M-UNet reduction off the first best-save's critical
    path and pins the verification programs before any donation history
    exists on the relay (defense-in-depth; the r2-r4 corruption itself was
    the save_params non-contiguity bug).
    """

    def __init__(self):
        self._by_treedef: Dict[Any, Tuple[Any, Any]] = {}

    def prepare(self, tree) -> None:
        """Compile the export/sum programs for this tree structure and run
        them once. Call BEFORE the first optimizer step."""
        treedef = jax.tree_util.tree_structure(tree)
        if treedef in self._by_treedef:
            return
        export = jax.jit(
            lambda t: jax.tree.map(lambda a: a + jnp.zeros((), a.dtype), t)
        )
        sums = jax.jit(
            lambda t: [
                jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)))
                for x in jax.tree_util.tree_leaves(t)
            ]
        )
        jax.block_until_ready(export(tree))
        jax.block_until_ready(sums(tree))
        self._by_treedef[treedef] = (export, sums)

    def sums_dict(self, tree) -> Dict[str, float]:
        """{flat-path: trusted |x|-sum} — sidecar checksums for
        TrainCheckpointer computed through the early-compiled program."""
        paths = [
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        ]
        return dict(zip(paths, self.ref_sums(tree)))

    def ref_sums(self, tree) -> List[float]:
        treedef = jax.tree_util.tree_structure(tree)
        if treedef not in self._by_treedef:
            logger.warning(
                "ParamExporter.prepare was not called early for this tree "
                "structure; late-compiled programs can read stale buffers"
            )
            self.prepare(tree)
        _, sums = self._by_treedef[treedef]
        return [float(s) for s in jax.device_get(sums(tree))]

    def fetch(self, tree, max_retries: int = 3):
        """Fetch tree to host numpy, verified against the early-compiled
        reference sums; raises RuntimeError on persistent corruption."""
        treedef = jax.tree_util.tree_structure(tree)
        ref = self.ref_sums(tree)
        export, sums_fn = self._by_treedef[treedef]
        last_bad: List[int] = []
        for attempt in range(max_retries + 1):
            src = tree if attempt == 0 else export(tree)
            # np.array(copy=True): ONE materializing read per leaf — a bare
            # np.asarray view refetches per access with independent
            # staleness through the relay (see fetch_params_verified)
            host = [
                np.array(l, copy=True) for l in jax.tree_util.tree_leaves(src)
            ]
            bad = [
                i for i, h in enumerate(host)
                if not np.isclose(
                    float(np.abs(np.asarray(h, np.float64)).sum()),
                    ref[i], rtol=1e-3, atol=1e-3,
                )
            ]
            if not bad:
                if attempt:
                    logger.warning(
                        "ParamExporter: healed stale fetch via export "
                        "(attempt %d)", attempt,
                    )
                return jax.tree_util.tree_unflatten(treedef, host)
            last_bad = bad
            logger.warning(
                "ParamExporter: %d/%d leaves mismatch trusted sums "
                "(attempt %d) — re-exporting", len(bad), len(host), attempt + 1,
            )
        raise RuntimeError(
            f"param fetch corrupt after {max_retries} export retries: "
            f"{len(last_bad)} leaves disagree with early-compiled checksums"
        )


def save_params(params, path: str, fetcher=None) -> None:
    """Save a params pytree as a flat safetensors file (verified fetch).

    `fetcher` (e.g. ParamExporter.fetch) overrides the default
    fetch_params_verified — trainers pass their early-compiled exporter."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    on_device = any(
        isinstance(l, jax.Array) and next(iter(l.devices())).platform != "cpu"
        for l in jax.tree_util.tree_leaves(params)
    )
    host = fetcher(params) if (fetcher and on_device) else fetch_params_verified(params)
    # C-contiguous normalization is REQUIRED before safetensors: arrays
    # fetched from TPU-layout jax buffers can be non-C-contiguous (e.g.
    # conv kernels with tiny minor dims), and safetensors serializes their
    # raw bytes as if C-ordered — the silent element-scrambling that
    # corrupted every r2-r4 conv_out kernel (round-5 root cause, part 2;
    # reproduced minimally: push->copy->save_file->load mismatches exactly
    # decoder/encoder conv_out kernels, pure-numpy roundtrip is clean)
    flat = {
        k: np.ascontiguousarray(v) for k, v in flatten_params(host).items()
    }
    st_numpy.save_file(flat, path)
    if on_device and os.environ.get("IRET_NO_VERIFY_FETCH") != "1":
        # write-path verification: reload the file (page-cached, cheap) and
        # compare against the verified host copy — closes the last silent-
        # corruption window between device and disk
        reread = dict(st_numpy.load_file(path))
        bad = [
            k for k, v in flat.items()
            if k not in reread or not np.array_equal(
                np.asarray(reread[k]), np.asarray(v)
            )
        ]
        if bad:
            raise RuntimeError(
                f"checkpoint write verification failed for {len(bad)} "
                f"tensors in {path} (first: {bad[0]})"
            )


def load_params(path: str):
    return unflatten_params(dict(st_numpy.load_file(path)))


# ---------------------------------------------------------------------------
# Pipeline directory layout
# ---------------------------------------------------------------------------

_COMPONENTS = ("unet", "vae", "text_encoder", "text_encoder_2")


def save_pipeline(
    directory: str,
    params: Dict[str, Any],
    config,
    extra_meta: Optional[Dict[str, Any]] = None,
    skip_existing: Tuple[str, ...] = (),
    fetcher=None,
) -> None:
    """Write a full pipeline checkpoint: per-component safetensors + configs.

    skip_existing: components whose safetensors file is NOT rewritten when it
    already exists in `directory`. The trainer passes its frozen components
    (VAE/text encoders) here so repeated best-checkpoint saves only rewrite
    the UNet — on slow disks the frozen ~1GB was a third of every save.
    fetcher: trusted device->host fetch (ParamExporter.fetch) — trainers
    pass their early-compiled exporter so saves survive the relay's
    stale-buffer behavior."""
    os.makedirs(directory, exist_ok=True)
    for comp in _COMPONENTS:
        if comp in params:
            path = os.path.join(directory, comp, "model.safetensors")
            if comp in skip_existing and os.path.exists(path):
                continue
            save_params(params[comp], path, fetcher=fetcher)
    meta = {
        "_framework": "image_restoration_and_enhancement_tpu",
        "components": [c for c in _COMPONENTS if c in params],
        "config": dataclasses.asdict(config) if dataclasses.is_dataclass(config) else config,
    }
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(directory, "model_index.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_pipeline(directory: str) -> Dict[str, Any]:
    """Load per-component params from a pipeline directory."""
    params = {}
    for comp in _COMPONENTS:
        p = os.path.join(directory, comp, "model.safetensors")
        if os.path.exists(p):
            params[comp] = load_params(p)
    if not params:
        raise FileNotFoundError(f"No component checkpoints under {directory}")
    return params


def load_pipeline_model_config(directory: str):
    """Read the SDModelConfig a pipeline checkpoint was saved with (from
    model_index.json's `config` entry), or None when absent/unparseable.
    Lets the serving layer auto-detect e.g. an SDXL fine-tune."""
    path = os.path.join(directory, "model_index.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            meta = json.load(f)
        cfg = meta.get("config")
        if not isinstance(cfg, dict):
            return None
        from ..config import model_config_from_dict

        return model_config_from_dict(cfg)
    except Exception:  # noqa: BLE001 — a malformed meta must not break loads
        logger.exception("Unparseable model config in %s", path)
        return None


def pipeline_exists(directory: str) -> bool:
    return os.path.exists(os.path.join(directory, "model_index.json")) or any(
        os.path.exists(os.path.join(directory, c, "model.safetensors"))
        for c in _COMPONENTS
    )


def find_latest_checkpoint(model_dir: str) -> Optional[str]:
    """Reference semantics (src/inference.py:93-137): prefer `best/`, else the
    numerically-largest `checkpoint-*`, else `final/`."""
    if not os.path.isdir(model_dir):
        return None
    best = os.path.join(model_dir, "best")
    if pipeline_exists(best):
        return best
    cands = []
    for name in os.listdir(model_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and pipeline_exists(os.path.join(model_dir, name)):
            cands.append((int(m.group(1)), name))
    if cands:
        return os.path.join(model_dir, max(cands)[1])
    final = os.path.join(model_dir, "final")
    if pipeline_exists(final):
        return final
    return None


# ---------------------------------------------------------------------------
# Orbax training-state checkpointing (params + optimizer + step)
# ---------------------------------------------------------------------------


def tree_abs_sums(tree) -> Dict[str, float]:
    """{flat-path: sum(|leaf|)} computed ON DEVICE (one jit; scalar
    fetches only — trustworthy through the relay, see
    fetch_params_verified). Used as a cheap content signature."""
    paths, leaves = zip(*jax.tree_util.tree_flatten_with_path(tree)[0])

    def _sums(ls):
        return [jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))) for x in ls]

    sums = jax.device_get(jax.jit(_sums)(list(leaves)))
    return {jax.tree_util.keystr(p): float(s) for p, s in zip(paths, sums)}


class TrainCheckpointer:
    """Orbax-backed save/restore of full training state (true resume).

    Each save also writes a `checksums_{step}.json` sidecar of device-side
    per-leaf |x| sums; restore verifies the restored leaves against it and
    raises on disagreement, so a corrupted serialized train state (the
    round-5 checkpoint-corruption class — see save_params) can never be
    silently resumed from."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def _checksum_path(self, step: int) -> str:
        return os.path.join(self.directory, f"checksums_{step}.json")

    def save(self, step: int, state, wait: bool = False,
             checksums: Optional[Dict[str, float]] = None) -> None:
        """Kick off an async save. By default does NOT block on the background
        commit: on slow disks the finalize of a 3.2GiB state takes 10+ minutes
        and blocking here serialized the whole epoch loop (orbax itself waits
        for any previous in-flight save before starting a new one). Call
        wait() (or pass wait=True) before process exit.

        checksums: trusted {path: |x|-sum} (ParamExporter.sums_dict) —
        preferred over the inline tree_abs_sums so the big reduction
        program is the one pre-compiled at trainer start."""
        try:
            sums = checksums if checksums is not None else tree_abs_sums(state)
            with open(self._checksum_path(step), "w") as f:
                json.dump(sums, f)
        except Exception:  # noqa: BLE001 — checksums are a guard, not a gate
            logger.exception("could not write train-state checksums")
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(state_template)
        )
        cs_path = self._checksum_path(step)
        if os.path.exists(cs_path) and os.environ.get("IRET_NO_VERIFY_FETCH") != "1":
            with open(cs_path) as f:
                want = json.load(f)
            got = tree_abs_sums(restored)
            bad = [
                k for k, v in want.items()
                if k in got and not np.isclose(got[k], v, rtol=1e-3, atol=1e-3)
            ]
            if bad:
                raise RuntimeError(
                    f"restored train state at step {step} fails checksum "
                    f"verification for {len(bad)} leaves (first: {bad[0]}) — "
                    f"refusing to resume from a corrupt checkpoint"
                )
        return restored

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


# ---------------------------------------------------------------------------
# Torch (diffusers / transformers) -> flax name mapping
# ---------------------------------------------------------------------------


def _is_conv_kernel(torch_name: str) -> bool:
    # Conv weights in diffusers UNet/VAE: conv*, downsamplers/upsamplers,
    # proj_in/proj_out of Transformer2D (1x1 convs), quant convs.
    conv_markers = (
        "conv", "downsamplers", "upsamplers", "quant_conv",
    )
    last = torch_name.rsplit(".", 2)
    return any(m in torch_name for m in conv_markers) or (
        len(last) >= 2 and last[-2] in ("proj_in", "proj_out") and "transformer" not in torch_name.split(last[-2])[1]
    )


_NORM_PARENTS = (
    "norm", "norm1", "norm2", "norm3", "group_norm", "conv_norm_out",
    "layer_norm1", "layer_norm2", "final_layer_norm",
)


def translate_torch_key(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """Map one diffusers/transformers param name to (flax_path, kind).

    kind in {"conv", "dense", "norm_scale", "bias", "embed", "raw"} and
    decides the layout transform.
    """
    key = torch_key
    # transformers CLIP prefix
    key = key.replace("text_model.embeddings.", "")
    key = key.replace("text_model.encoder.", "")
    key = key.replace("text_model.", "")
    key = key.replace("mlp.", "")
    # diffusers GEGLU feed-forward
    key = key.replace("ff.net.0.proj", "ff.proj_in")
    key = key.replace("ff.net.2", "ff.proj_out")
    key = key.replace("to_out.0", "to_out")
    key = key.replace("time_embedding.linear_1", "time_embedding.linear_1")
    # index-suffixed module lists: down_blocks.0 -> down_blocks_0
    key = re.sub(
        r"\b(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
        r"downsamplers|upsamplers|layers)\.(\d+)",
        r"\1_\2",
        key,
    )
    parts = key.split(".")
    leaf = parts[-1]
    parent = parts[-2] if len(parts) > 1 else ""

    if parent == "token_embedding" and leaf == "weight":
        return tuple(parts[:-1] + ["embedding"]), "embed"
    if parent == "position_embedding" and leaf == "weight":
        return tuple(parts[:-1]), "raw"  # flax bare param

    if leaf == "weight":
        if parent in _NORM_PARENTS:
            return tuple(parts[:-1] + ["scale"]), "norm_scale"
        # conv vs dense by parent name
        conv_parents = (
            "conv_in", "conv_out", "conv1", "conv2", "conv_shortcut", "conv",
            "quant_conv", "post_quant_conv",
        )
        is_tx_proj = parent in ("proj_in", "proj_out") and any(
            "transformer_blocks" in p or p == "ff" for p in parts
        ) and parts[parts.index(parent) - 1] == "ff"
        if parent in conv_parents:
            return tuple(parts[:-1] + ["kernel"]), "conv"
        if parent in ("proj_in", "proj_out") and not is_tx_proj:
            # Transformer2D spatial projections are 1x1 convs in SD1.5
            # (use_linear_projection=False) — but GEGLU ff.proj_* are Dense.
            if "ff" in parts:
                return tuple(parts[:-1] + ["kernel"]), "dense"
            return tuple(parts[:-1] + ["kernel"]), "conv"
        return tuple(parts[:-1] + ["kernel"]), "dense"
    if leaf == "bias":
        return tuple(parts[:-1] + ["bias"]), "bias"
    return tuple(parts), "raw"


def import_torch_state_dict(
    state_dict: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """Convert a diffusers/transformers torch state dict (numpy arrays) into
    a flax params pytree matching our module structure."""
    flat: Dict[str, np.ndarray] = {}
    for tkey, arr in state_dict.items():
        arr = np.asarray(arr)
        path, kind = translate_torch_key(tkey)
        if kind == "conv":
            if arr.ndim != 4:
                kind = "dense"  # e.g. a Dense that matched conv heuristics
            else:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if kind == "dense" and arr.ndim == 2:
            arr = arr.T
        flat["/".join(path)] = arr
    return unflatten_params(flat)


_NORM_LEAF_PARENTS = set(_NORM_PARENTS)


def export_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_state_dict: flax params -> diffusers-style
    torch names/layouts. Lets checkpoints trained here be consumed by the
    torch ecosystem (and powers full-coverage import round-trip tests)."""
    flat = flatten_params(params)
    out: Dict[str, np.ndarray] = {}
    for path, arr in flat.items():
        parts = path.split("/")
        leaf = parts[-1]
        parent = parts[-2] if len(parts) > 1 else ""
        prefix = parts[:-1]
        # indexed module lists back to dotted indices
        name = ".".join(prefix)
        name = re.sub(
            r"\b(down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
            r"downsamplers|upsamplers|layers)_(\d+)",
            r"\1.\2",
            name,
        )
        name = name.replace("ff.proj_in", "ff.net.0.proj")
        name = name.replace("ff.proj_out", "ff.net.2")
        if name.endswith("to_out"):
            name = name + ".0"
        if leaf == "scale":
            out[f"{name}.weight"] = np.asarray(arr)
        elif leaf == "bias":
            out[f"{name}.bias"] = np.asarray(arr)
        elif leaf == "embedding":
            out[f"{name}.weight"] = np.asarray(arr)
        elif leaf == "kernel":
            a = np.asarray(arr)
            if a.ndim == 4:
                out[f"{name}.weight"] = a.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            else:
                out[f"{name}.weight"] = a.T
        elif leaf == "position_embedding":
            out["position_embedding.weight"] = np.asarray(arr)
        else:
            out[f"{name}.{leaf}"] = np.asarray(arr)
    return out


def load_torch_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-saved .safetensors file as numpy (no torch needed)."""
    return dict(st_numpy.load_file(path))


def import_hf_pipeline(directory: str) -> Dict[str, Any]:
    """Import a diffusers pipeline directory (torch safetensors) into our
    params bundle {unet, vae, text_encoder}. Used once to seed fine-tuning
    from SD1.5 / SD-inpainting weights."""
    out = {}
    comp_files = {
        "unet": ("diffusion_pytorch_model.safetensors", "unet"),
        "vae": ("diffusion_pytorch_model.safetensors", "vae"),
        "text_encoder": ("model.safetensors", "text_encoder"),
    }
    for comp, (fname, sub) in comp_files.items():
        p = os.path.join(directory, sub, fname)
        if os.path.exists(p):
            out[comp] = import_torch_state_dict(load_torch_safetensors(p))
    if not out:
        raise FileNotFoundError(f"No torch safetensors found under {directory}")
    return out
