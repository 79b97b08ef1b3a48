"""Checkpoint save/restore via orbax, with the config embedded.

Replaces Lightning's ckpt handling (reference model.py:25
save_hyperparameters; train.py:41 resume; SURVEY.md §5 checkpoint/resume):
the YAML config rides inside the checkpoint so a restore never depends on an
external file agreeing with the weights.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple, Union

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ConfigNode


def save_train_state(
    ckpt_dir: Union[str, Path],
    state,
    config: Optional[ConfigNode] = None,
    keep: int = 3,
) -> None:
    """Save {params, opt_state, step} (+ config JSON) under
    ckpt_dir/step_{N}."""
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = ckpt_dir / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", _to_savable(state), force=True)
    ckptr.wait_until_finished()
    if config is not None:
        (path / "config.json").write_text(json.dumps(config.to_dict()))
    _prune_old(ckpt_dir, keep)


def _to_savable(state):
    return jax.tree.map(np.asarray, state)


def _prune_old(ckpt_dir: Path, keep: int) -> None:
    steps = sorted(ckpt_dir.glob("step_*"))
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)


def latest_checkpoint(ckpt_dir: Union[str, Path]) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(ckpt_dir.glob("step_*"))
    return steps[-1] if steps else None


def restore_train_state(
    path: Union[str, Path], abstract_state
) -> Tuple[object, Optional[ConfigNode]]:
    """Restore from a step_N dir (or a ckpt_dir, taking the latest).
    abstract_state: a pytree of the same structure (e.g. a freshly built
    TrainState) used as the restore template."""
    path = Path(path).resolve()
    if not (path / "state").exists():
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        path = latest
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(
        lambda x: ocp.utils.to_shape_dtype_struct(x), _to_savable(abstract_state)
    )
    state = ckptr.restore(path / "state", template)
    cfg = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        cfg = ConfigNode(json.loads(cfg_file.read_text()))
    return state, cfg


def save_params(
    ckpt_dir: Union[str, Path], params, config: Optional[ConfigNode] = None
) -> None:
    """Inference-only export: just the params (+ config)."""
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir / "params", jax.tree.map(np.asarray, params),
               force=True)
    ckptr.wait_until_finished()
    if config is not None:
        (ckpt_dir / "config.json").write_text(json.dumps(config.to_dict()))


def average_params(
    sources, weights=None
) -> Tuple[object, Optional[ConfigNode]]:
    """Uniform (or `weights`-weighted) average of the param trees from
    `sources` — each anything `restore_params` accepts (a `save_params`
    export, a training ckpt root, or a step_N dir).

    Checkpoint averaging is the classic cheap quality lever for
    T5-family models (the original T5 release shipped averaged
    checkpoints); with `train.py` keeping the last 3 periodic
    checkpoints plus `ckpt_best`, the inputs are already on disk at the
    end of every run.  Accumulates in float64, returns each leaf at its
    original dtype; the config comes from the first source that has one
    and every source must agree on tree structure.
    """
    if not sources:
        raise ValueError("average_params: no sources")
    if weights is None:
        weights = [1.0] * len(sources)
    if len(weights) != len(sources):
        raise ValueError("average_params: len(weights) != len(sources)")
    total = float(sum(weights))
    if not np.isfinite(total) or total <= 0.0:
        raise ValueError(
            f"average_params: weights must sum to a finite positive "
            f"value, got {total} from {list(weights)}"
        )
    acc, cfg, treedef0 = None, None, None
    for src, w in zip(sources, weights):
        params, src_cfg = restore_params(src)
        cfg = cfg if cfg is not None else src_cfg
        leaves, treedef = jax.tree.flatten(params)
        if treedef0 is None:
            treedef0 = treedef
            acc = [np.zeros(l.shape, np.float64) for l in leaves]
            dtypes = [np.asarray(l).dtype for l in leaves]
        elif treedef != treedef0:
            raise ValueError(
                f"average_params: tree structure of {src} differs from "
                f"{sources[0]}"
            )
        for a, l in zip(acc, leaves):
            a += (w / total) * np.asarray(l, np.float64)
    mean = [a.astype(d) for a, d in zip(acc, dtypes)]
    return jax.tree.unflatten(treedef0, mean), cfg


def save_params_npz(
    path: Union[str, Path],
    params,
    config: Optional[ConfigNode] = None,
    dtype: str = "bfloat16",
) -> None:
    """Single-FILE inference export: the whole param tree (+ config) in
    one .npz, weights cast to `dtype` ("bfloat16"/"float16"/"float32").

    This is the repo's checkpoint-of-record format (the reference ships
    `epoch=799-step=119200.ckpt`, /root/reference/demo.ipynb cell-0; we
    ship a ~60 MB npz instead of a 350 MB Lightning pickle): a committed
    artifact that `Music2MIDI.from_npz` / `evaluate.py --ckpt x.npz` /
    `bench.py` load with no orbax directory tree to keep intact.

    Layout: one array per leaf, keyed by its tree path joined with '/'
    (list indices spelled '#i', so keys reconstruct the nested
    dict/list pytree exactly); bfloat16 rides as its uint16 bit pattern
    (plain .npy cannot represent ml_dtypes dtypes) with the true dtype
    recorded in the '__dtypes__' JSON entry; the config (if any) is the
    '__config__' JSON entry.
    """
    import ml_dtypes

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    target = np.dtype(
        {"bfloat16": ml_dtypes.bfloat16, "float16": np.float16,
         "float32": np.float32}[dtype]
    )
    arrays, dtypes = {}, {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            f"#{k.idx}" if hasattr(k, "idx") else str(k.key) for k in kpath
        )
        a = np.asarray(leaf)
        # cast only float weights; keep any integer leaves bit-exact
        if np.issubdtype(a.dtype, np.floating) or a.dtype == ml_dtypes.bfloat16:
            a = a.astype(target)
        dtypes[key] = a.dtype.name
        if a.dtype == ml_dtypes.bfloat16:
            a = a.view(np.uint16)
        arrays[key] = a
    arrays["__dtypes__"] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8
    )
    if config is not None:
        arrays["__config__"] = np.frombuffer(
            json.dumps(config.to_dict()).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **arrays)


def load_params_npz(
    path: Union[str, Path]
) -> Tuple[object, Optional[ConfigNode]]:
    """Load a `save_params_npz` export -> (params pytree, config|None)."""
    import ml_dtypes

    with np.load(Path(path)) as z:
        dtypes = json.loads(bytes(z["__dtypes__"]).decode())
        cfg = None
        if "__config__" in z:
            cfg = ConfigNode(json.loads(bytes(z["__config__"]).decode()))
        root: dict = {}
        for key, want in dtypes.items():
            a = z[key]
            if want == "bfloat16":
                a = a.view(ml_dtypes.bfloat16)
            node, parts = root, key.split("/")
            for i, part in enumerate(parts):
                k = int(part[1:]) if part.startswith("#") else part
                if i == len(parts) - 1:
                    node[k] = a
                else:
                    node = node.setdefault(k, {})
    return _intkeyed_to_lists(root), cfg


def _intkeyed_to_lists(node):
    """Rebuild list nodes (stored as {0: ..., 1: ...} int-keyed dicts)."""
    if not isinstance(node, dict):
        return node
    if node and all(isinstance(k, int) for k in node):
        return [_intkeyed_to_lists(node[i]) for i in range(len(node))]
    return {k: _intkeyed_to_lists(v) for k, v in node.items()}


def restore_params(
    ckpt_dir: Union[str, Path]
) -> Tuple[object, Optional[ConfigNode]]:
    """Restore params for inference from any layout:
      * a save_params_npz single-file export (*.npz),
      * a save_params export (ckpt_dir/params), or
      * a training checkpoint dir (ckpt_dir[/step_N]/state), taking the
        latest step — params are element 0 of the saved TrainState tuple.
    """
    ckpt_dir = Path(ckpt_dir).resolve()
    if ckpt_dir.suffix == ".npz":
        return load_params_npz(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    if (ckpt_dir / "params").exists():
        params = ckptr.restore(ckpt_dir / "params")
        cfg_file = ckpt_dir / "config.json"
    else:
        path = ckpt_dir
        if not (path / "state").exists():
            latest = latest_checkpoint(path)
            if latest is None:
                raise FileNotFoundError(f"no checkpoint under {path}")
            path = latest
        state = ckptr.restore(path / "state")
        # NamedTuple fields serialize by name
        params = state["params"]
        cfg_file = path / "config.json"
    cfg = None
    if cfg_file.exists():
        cfg = ConfigNode(json.loads(cfg_file.read_text()))
    return params, cfg
